"""Gather variants with REAL bench neighbor lists (locality matters 7x).

Builds the 98k-atom bench engine, extracts the rebo list + positions, and
times the candidate [K,N]-pipeline gathers, plus the effect of the mirror
permutation's locality.
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


def bench(fn, args, reps=10):
    import jax
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print("# warmed", flush=True)

    from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    state = rebomos_bulk_commensurate(nx=34, ny=48, nz=10,
                                      dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    state = velocity_create(state, units.METAL, 300.0, seed=12345)
    eng = Engine(state, pair, [FixNVE()], units.METAL, skin=1.0)
    t0 = time.time()
    eng.rebuild_neighbors()
    print(f"# rebuild {time.time()-t0:.1f}s", flush=True)

    st, nbr = eng.state, eng.nbr
    rebo = nbr.lists["rebo"]
    ghosts = nbr.ghosts
    h = st.box.h
    N, K = rebo.idx.shape
    Np = -(-N // 128) * 128
    x_all = jax.jit(lambda x: ghosts.all_positions(x, h))(st.x)
    x_all = jax.block_until_ready(x_all)
    M = x_all.shape[0]
    print(f"# N={N} K={K} M={M}", flush=True)

    idx = rebo.idx
    idxTp = jnp.pad(jnp.swapaxes(idx, 0, 1), ((0, 0), (0, Np - N)))
    mir = np.asarray(rebo.mirror)
    mir_i = np.maximum(mir, 0) // K
    mir_k = np.maximum(mir, 0) % K
    mirT = jnp.asarray(np.ascontiguousarray(
        (mir_k * Np + mir_i).T).astype(np.int32))
    mirT = jnp.pad(mirT, ((0, 0), (0, Np - N)))

    # real-data variants
    f1 = jax.jit(lambda x, i: x[i.reshape(-1)])
    print(f"1 row [E,3] flat idx (N,K order):   "
          f"{bench(f1, (x_all, idx)):8.2f} ms", flush=True)
    f1t = jax.jit(lambda x, i: x[i.reshape(-1)].reshape(K, Np, 3))
    print(f"1T row [E,3] flat idxT (K,N order): "
          f"{bench(f1t, (x_all, idxTp)):8.2f} ms", flush=True)
    xT = jnp.asarray(np.ascontiguousarray(np.asarray(x_all).T))
    f2 = jax.jit(lambda x, i: jnp.take(x, i, axis=1))
    print(f"2 take [3,M] ax1 -> [3,K,Np]:       "
          f"{bench(f2, (xT, idxTp)):8.2f} ms", flush=True)
    f7 = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
    print(f"7 take [M,3] ax0 -> [K,Np,3]:       "
          f"{bench(f7, (x_all, idxTp)):8.2f} ms", flush=True)

    # the old [N,K] pipeline: gather + transpose to [K,Np] x3
    def old_prep(x, i):
        D = x[i]                                   # [N,K,3]
        outs = []
        for a in range(3):
            arrT = jnp.swapaxes(D[..., a], 0, 1)
            outs.append(jnp.pad(arrT, ((0, 0), (0, Np - N))))
        return tuple(outs)
    print(f"8 old gather+3x transpose:          "
          f"{bench(jax.jit(old_prep), (x_all, idx)):8.2f} ms", flush=True)

    # mirror gathers with REAL mirror table
    g3 = jax.block_until_ready(
        jax.jit(lambda x, i: jnp.take(x, i, axis=1))(xT, idxTp))
    f4 = jax.jit(lambda g, m: jnp.take(g.reshape(3, -1), m, axis=1))
    print(f"4 mirror take [3,K*Np] ax1:         "
          f"{bench(f4, (g3, mirT)):8.2f} ms", flush=True)
    gr = jnp.asarray(np.ascontiguousarray(
        np.asarray(g3).transpose(1, 2, 0).reshape(K * Np, 3)))
    f5 = jax.jit(lambda g, m: g[m.reshape(-1)].reshape(K, Np, 3))
    print(f"5 mirror row [K*Np,3]:              "
          f"{bench(f5, (gr, mirT)):8.2f} ms", flush=True)

    # old mirror_combine for reference
    from lammps_plugins_tpu.neighbor.neighbor import mirror_combine
    gx = g3[0][:, :N].swapaxes(0, 1)
    gy = g3[1][:, :N].swapaxes(0, 1)
    gz = g3[2][:, :N].swapaxes(0, 1)
    gx, gy, gz = map(jax.block_until_ready, (gx, gy, gz))
    f9 = jax.jit(lambda a, b, c: mirror_combine(a, b, c, rebo))
    print(f"9 old mirror_combine [N,K]:         "
          f"{bench(f9, (gx, gy, gz)):8.2f} ms", flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(800,), daemon=True).start()
    main()
    os._exit(0)
