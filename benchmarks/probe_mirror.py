"""Time mirror-combine variants with REAL bench mirror tables.

Each variant is timed by looping R iterations INSIDE one jit (the tunneled
dispatch costs ~35-40 ms per call, memory: tpu-tunnel-quirks) with a data
dependency between iterations so nothing is CSE'd away.

Variants (E = N*K edges; kernel emits gx,gy,gz as [K,Np]):
  V0 row-gather, k-major flat (current production fusion.61, ~13.5 ms)
  V1 per-component 2-D element gather, k-major in/out
  V2 transpose to [Np,K] then per-component 2-D element gather, n-major idx
  V3 per-component 2-D element gather, k-major source / n-major output
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


def timeit(name, fn, args, reps=3):
    import jax
    jax.block_until_ready(fn(*args))        # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1e3 / ITERS:8.2f} ms/iter", flush=True)


ITERS = 20


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
    print(f"# N={N} K={K} Np={Np}", flush=True)

    mir = np.asarray(rebo.mirror)           # [N,K], n-major flat (i*K+k)
    ok = np.asarray(rebo.mask) & (mir >= 0)
    mir_i = np.where(ok, mir // K, 0)
    mir_k = np.where(ok, mir % K, 0)

    # k-major tables, [K,Np] layout
    mirT = jnp.asarray(np.pad((mir_k * Np + mir_i).T.astype(np.int32),
                              ((0, 0), (0, Np - N))))
    okT = jnp.asarray(np.pad(ok.T.astype(np.float32),
                             ((0, 0), (0, Np - N))))
    # n-major tables, [Np,K] layout (values index n*K+k flat order)
    mirN = jnp.asarray(np.pad((mir_i * K + mir_k).astype(np.int32),
                              ((0, Np - N), (0, 0))))
    okN = jnp.asarray(np.pad(ok.astype(np.float32), ((0, Np - N), (0, 0))))
    # k-major source values indexed from an n-major output table
    mirNK = jnp.asarray(np.pad((mir_k * Np + mir_i).astype(np.int32),
                               ((0, Np - N), (0, 0))))

    key = jax.random.PRNGKey(0)
    gx, gy, gz = (jax.random.normal(k, (K, Np), jnp.float32)
                  for k in jax.random.split(key, 3))
    gx, gy, gz = map(jax.block_until_ready, (gx, gy, gz))

    def loop(body):
        def run(gx, gy, gz):
            def it(i, carry):
                gx, gy, gz, acc = carry
                f = body(gx, gy, gz)            # [Np,3]
                s = jnp.sum(f[0]) * 1e-20
                return (gx + s, gy + s, gz + s, acc + f)
            z = jnp.zeros((Np, 3), jnp.float32)
            return lax.fori_loop(0, ITERS, it, (gx, gy, gz, z))[3]
        return jax.jit(run)

    def v0(gx, gy, gz):
        G = jnp.stack([gx, gy, gz], axis=-1)
        gm = G.reshape(K * Np, 3)[mirT.reshape(-1)].reshape(K, Np, 3)
        gm = gm * okT[..., None]
        return jnp.sum(G, 0) - jnp.sum(gm, 0)

    def v1(gx, gy, gz):
        outs = []
        for g in (gx, gy, gz):
            gm = g.reshape(-1)[mirT] * okT          # [K,Np]
            outs.append(jnp.sum(g, 0) - jnp.sum(gm, 0))
        return jnp.stack(outs, -1)

    def v2(gx, gy, gz):
        outs = []
        for g in (gx, gy, gz):
            gT = jnp.swapaxes(g, 0, 1)              # [Np,K] dense copy
            gm = gT.reshape(-1)[mirN] * okN         # [Np,K]
            outs.append(jnp.sum(g, 0) - jnp.sum(gm, 1))
        return jnp.stack(outs, -1)

    def v3(gx, gy, gz):
        outs = []
        for g in (gx, gy, gz):
            gm = g.reshape(-1)[mirNK] * okN         # [Np,K] out, k-major src
            outs.append(jnp.sum(g, 0) - jnp.sum(gm, 1))
        return jnp.stack(outs, -1)

    # correctness cross-check (v0 vs others)
    r0 = np.asarray(jax.jit(v0)(gx, gy, gz))
    for nm, v in (("v1", v1), ("v2", v2), ("v3", v3)):
        r = np.asarray(jax.jit(v)(gx, gy, gz))
        err = np.abs(r - r0).max()
        print(f"# {nm} vs v0 max err {err:.2e}", flush=True)

    timeit("V0 row-gather k-major (current)", loop(v0), (gx, gy, gz))
    timeit("V1 elem 2-D k-major in/out     ", loop(v1), (gx, gy, gz))
    timeit("V2 transpose + elem n-major    ", loop(v2), (gx, gy, gz))
    timeit("V3 elem k-major src n-major out", loop(v3), (gx, gy, gz))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(900,), daemon=True).start()
    main()
    os._exit(0)
