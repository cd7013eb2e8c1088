"""Mirror gather: table-size / index-locality / dtype sensitivity.

The trace shows the mirror gather (fusion over [E,3] rows from an [E,3]
table) at ~4.3 ns/row while the D-gather (same row count, 183k-row table)
runs at ~1.8 ns/row.  Hypotheses to separate:
  (a) table size (VMEM-resident table vs HBM random rows),
  (b) index locality (k-major mirror targets stride Np apart for
      adjacent output lanes; atom-major targets are near-sorted),
  (c) row width / alignment (12 B rows straddle 32 B sectors).

V20 baseline mirror gather           (E-row table, k-major targets)
V21 same output, 183k-row table      (pure table-size effect)
V22 atom-major table + indices       (locality effect; table [Np*K, 3])
V23 sorted indices                   (upper bound of locality)
V24 [E,4] 16B-aligned rows           (alignment effect)
V25 bf16 [E,3] table                 (byte-volume effect)
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _watchdog(seconds):
    time.sleep(seconds)
    print("# watchdog: clean exit", flush=True)
    os._exit(0)


ITERS = 20


def timeit(name, fn, args, reps=3):
    import jax
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1e3 / ITERS:8.2f} ms/iter", flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print("# warmed", flush=True)

    from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    state = rebomos_bulk_commensurate(nx=34, ny=48, nz=10, dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    state = velocity_create(state, units.METAL, 300.0, seed=12345)
    eng = Engine(state, pair, [FixNVE()], units.METAL, skin=1.0)
    eng.rebuild_neighbors()
    rebo = eng.nbr.lists["rebo"]
    N, K = rebo.idx.shape
    Np = -(-N // 128) * 128
    E = K * Np
    print(f"# N={N} K={K} E={E} valid={int(np.asarray(rebo.mask).sum())}",
          flush=True)

    mir = np.asarray(rebo.mirror)
    ok = np.asarray(rebo.mask) & (mir >= 0)
    mir_i = np.where(ok, mir // K, 0)          # owner atom of the mirror edge
    mir_k = np.where(ok, mir % K, 0)           # its slot
    # k-major flat targets (current production layout)
    mirT_km = jnp.asarray(np.pad((mir_k * Np + mir_i).T.astype(np.int32),
                                 ((0, 0), (0, Np - N))))
    # atom-major flat targets
    mirT_am = jnp.asarray(np.pad((mir_i * K + mir_k).T.astype(np.int32),
                                 ((0, 0), (0, Np - N))))
    key = jax.random.PRNGKey(0)
    G3 = jax.block_until_ready(jax.random.normal(key, (E, 3), jnp.float32))
    G4 = jax.block_until_ready(jax.random.normal(key, (E, 4), jnp.float32))
    G3s = jax.block_until_ready(jax.random.normal(key, (183424, 3),
                                                  jnp.float32))
    G3h = jax.block_until_ready(G3.astype(jnp.bfloat16))
    idx_small = jnp.asarray(np.asarray(mirT_km) % 183424)
    idx_sorted = jnp.asarray(
        np.sort(np.asarray(mirT_km).reshape(-1)).reshape(K, Np))

    def loop(body, out_shape=(0,)):
        def run(G):
            def it(i, carry):
                G, acc = carry
                f = body(G)
                s = f.reshape(-1)[0] * 1e-20
                return (G + s.astype(G.dtype), acc + f.astype(jnp.float32))
            z = jnp.zeros((Np, 3), jnp.float32)
            return lax.fori_loop(0, ITERS, it, (G, z))[1]
        return jax.jit(run)

    def v20(G):
        rows = G[mirT_km.reshape(-1)]
        return jnp.sum(rows.reshape(K, Np, 3), 0)

    def v21(G):
        rows = G[idx_small.reshape(-1)]
        return jnp.sum(rows.reshape(K, Np, 3), 0)

    def v22(G):
        rows = G[mirT_am.reshape(-1)]
        return jnp.sum(rows.reshape(K, Np, 3), 0)

    def v23(G):
        rows = G[idx_sorted.reshape(-1)]
        return jnp.sum(rows.reshape(K, Np, 3), 0)

    def v24(G):
        rows = G[mirT_km.reshape(-1)]
        return jnp.sum(rows.reshape(K, Np, 4)[..., :3], 0)

    def v25(G):
        rows = G[mirT_km.reshape(-1)]
        return jnp.sum(rows.reshape(K, Np, 3).astype(jnp.float32), 0)

    timeit("V20 baseline k-major E-table    ", loop(v20), (G3,))
    timeit("V21 small 183k-row table        ", loop(v21), (G3,))
    timeit("V22 atom-major table+indices    ", loop(v22), (G3,))
    timeit("V23 fully sorted indices        ", loop(v23), (G3,))
    timeit("V24 [E,4] aligned rows          ", loop(v24), (G4,))
    timeit("V25 bf16 table                  ", loop(v25), (G3h,))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1200,), daemon=True).start()
    main()
    os._exit(0)
