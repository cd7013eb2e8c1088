"""Mirror gather: output-layout sensitivity + exact D-gather control.

V12: exact D-gather replica (x_all source, idxT indices) in this harness
V13: mirror gather with OUTPUT forced row-major via with_layout_constraint
V14: D-gather replica with OUTPUT forced row-major
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
    from jax.experimental.layout import Layout, with_layout_constraint

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
    ghosts = eng.nbr.ghosts
    h = state.box.h
    N, K = rebo.idx.shape
    Np = -(-N // 128) * 128
    E = K * Np
    print(f"# N={N} K={K} E={E}", flush=True)

    idxTp = jnp.pad(jnp.swapaxes(rebo.idx, 0, 1), ((0, 0), (0, Np - N)))
    mir = np.asarray(rebo.mirror)
    ok = np.asarray(rebo.mask) & (mir >= 0)
    mir_i = np.where(ok, mir // K, 0)
    mir_k = np.where(ok, mir % K, 0)
    mirT = jnp.asarray(np.pad((mir_k * Np + mir_i).T.astype(np.int32),
                              ((0, 0), (0, Np - N))))
    x_all = jax.block_until_ready(
        jax.jit(lambda x: ghosts.all_positions(x, h))(state.x))
    key = jax.random.PRNGKey(0)
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

    def v12(X):                              # D-gather replica
        rows = X[idxTp.reshape(-1)].reshape(K, Np, 3)
        return jnp.sum(rows, 0)

    def v13(G):
        rows = G[mirT.reshape(-1)]
        rows = with_layout_constraint(rows, Layout((0, 1)))
        return jnp.sum(rows.reshape(K, Np, 3), 0)

    def v14(X):
        rows = X[idxTp.reshape(-1)]
        rows = with_layout_constraint(rows, Layout((0, 1)))
        return jnp.sum(rows.reshape(K, Np, 3), 0)

    timeit("V12 D-gather replica            ", loop(v12), (x_all,))
    timeit("V13 mirror, out forced row-major", loop(v13), (G3,))
    timeit("V14 D-gather, out forced rowmaj ", loop(v14), (x_all,))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1500,), daemon=True).start()
    main()
    os._exit(0)
