"""Mirror gather: source-size and row-alignment sensitivity.

V7: [E,4] 16-byte-aligned rows, real mirror indices
V8: same index count, source truncated to 256k rows (3 MB) via mod
V9: source 38 MB, uniform-random indices (locality floor)
V10: [E,8] 32-byte rows, real mirror indices
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
    print(f"# N={N} K={K} E={E}", flush=True)

    mir = np.asarray(rebo.mirror)
    ok = np.asarray(rebo.mask) & (mir >= 0)
    mir_i = np.where(ok, mir // K, 0)
    mir_k = np.where(ok, mir % K, 0)
    mirT = jnp.asarray(np.pad((mir_k * Np + mir_i).T.astype(np.int32),
                              ((0, 0), (0, Np - N))))
    rng = np.random.default_rng(0)
    mirR = jnp.asarray(rng.integers(0, E, size=(K, Np)).astype(np.int32))

    key = jax.random.PRNGKey(0)
    G4 = jax.block_until_ready(jax.random.normal(key, (E, 4), jnp.float32))
    G8 = jax.block_until_ready(jax.random.normal(key, (E, 8), jnp.float32))
    G3 = jax.block_until_ready(jax.random.normal(key, (E, 3), jnp.float32))

    def loop(body):
        def run(G):
            def it(i, carry):
                G, acc = carry
                f = body(G)
                s = f[0, 0] * 1e-20
                return (G + s, acc + f)
            z = jnp.zeros((Np, 3), jnp.float32)
            return lax.fori_loop(0, ITERS, it, (G, z))[1]
        return jax.jit(run)

    def v7(G):
        gm = G[mirT.reshape(-1)].reshape(K, Np, 4)
        return jnp.sum(gm, 0)[:, :3]

    def v8(G):
        gm = G[(mirT % (256 * 1024)).reshape(-1)].reshape(K, Np, 3)
        return jnp.sum(gm, 0)

    def v9(G):
        gm = G[mirR.reshape(-1)].reshape(K, Np, 3)
        return jnp.sum(gm, 0)

    def v10(G):
        gm = G[mirT.reshape(-1)].reshape(K, Np, 8)
        return jnp.sum(gm, 0)[:, :3]

    timeit("V7  [E,4] rows, real mirror idx ", loop(v7), (G4,))
    timeit("V8  [E,3] rows, 3MB source      ", loop(v8), (G3,))
    timeit("V9  [E,3] rows, random idx      ", loop(v9), (G3,))
    timeit("V10 [E,8] rows, real mirror idx ", loop(v10), (G8,))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1500,), daemon=True).start()
    main()
    os._exit(0)
