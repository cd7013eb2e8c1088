"""Marginal-cost ablation of the real 98k-atom force path.

probe_mirror5/8/9 measured synthetic mirror-combine variants at ~11.5 ms
regardless of structure, while the production trace attributes 10.1 ms to
the mirror gather fusion and 2.6 ms to the D-gather.  Synthetic probes
evidently do not reproduce the production emitter; this probe measures the
REAL pipeline with pieces cut out, under jit, on the real neighbor data:

  A  full REBO force path (_rebo_forces_mirror_tn)            [baseline]
  B  A minus the mirror gather (fsum from own rows only)
  C  A minus mirror gather and D-gather (zero displacements)
  D  kernel only (pre-transposed inputs, no gathers, no combine)
  E  LJ pallas path (_lj_forces_pallas)                       [baseline]
  F  E minus the output remap scatter
  G  E minus cell-plane pack (planes precomputed)
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


def timeit(name, fn, *args, reps=5):
    import jax
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1e3:8.2f} ms", flush=True)
    return best


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
    from lammps_plugins_tpu.ops.rebo_pallas import _rebo_call

    state = rebomos_bulk_commensurate(nx=34, ny=48, nz=10, dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    state = velocity_create(state, units.METAL, 300.0, seed=12345)
    eng = Engine(state, pair, [FixNVE()], units.METAL, skin=1.0)
    eng.rebuild_neighbors()
    nbr = eng.nbr
    rebo = nbr.lists["rebo"]
    ghosts = nbr.ghosts
    h = state.box.h
    types = state.type
    el_own = pair.typemap[types]
    el_all = pair.typemap[ghosts.all_types(types)]
    N, K = rebo.idx.shape
    Np = -(-N // 128) * 128
    print(f"# N={N} K={K}", flush=True)

    x0 = state.x

    # -- A: full REBO mirror-path forces --------------------------------
    @jax.jit
    def fA(x):
        return pair._rebo_forces_mirror_tn(x, el_own, el_all, ghosts, rebo, h)

    # -- B: same minus mirror gather ------------------------------------
    def tn_parts(x, do_mirror, do_dgather):
        dtype = x.dtype
        idxT = rebo.idxT
        mskT = rebo.maskT.astype(dtype)
        jelT = jnp.zeros(rebo.jtypeT.shape, dtype)
        for t in range(1, len(pair.typemap_np)):
            jelT = jnp.where(rebo.jtypeT == t,
                             dtype.type(pair.typemap_np[t]), jelT)
        mirT = rebo.mirT
        mirvT = rebo.mirvT.astype(dtype)
        eiT = jnp.pad(el_own.astype(dtype).reshape(1, N),
                      ((0, 7), (0, Np - N)))
        x_all = ghosts.all_positions(x, h)
        if do_dgather:
            rows = x_all[idxT.reshape(-1)].reshape(K, Np, 3)
            xT = jnp.pad(jnp.swapaxes(x, 0, 1), ((0, 0), (0, Np - N)))
            dxT = rows[..., 0] - xT[0:1, :]
            dyT = rows[..., 1] - xT[1:2, :]
            dzT = rows[..., 2] - xT[2:3, :]
        else:
            s = jnp.sum(x_all) * 1e-30
            dxT = jnp.full((K, Np), 2.4, dtype) + s
            dyT = jnp.full((K, Np), 0.1, dtype) + s
            dzT = jnp.full((K, Np), 0.1, dtype) + s
        consts_key = tuple(sorted(pair._rebo_consts.items()))
        gx, gy, gz = _rebo_call(dxT, dyT, dzT, jelT, mskT, eiT,
                                consts_key=consts_key, interpret=False)
        fsum = jnp.sum(jnp.stack([gx, gy, gz], axis=-1), axis=0)
        if do_mirror:
            grows = jnp.stack([gx, gy, gz], axis=-1).reshape(K * Np, 3)
            gmir = grows[mirT.reshape(-1)].reshape(K, Np, 3) \
                * mirvT[..., None]
            fsum = fsum - jnp.sum(gmir, axis=0)
        return fsum[:N]

    fB = jax.jit(lambda x: tn_parts(x, False, True))
    fC = jax.jit(lambda x: tn_parts(x, False, False))
    fD = jax.jit(lambda x: tn_parts(x, True, False))

    timeit("A  REBO full            ", fA, x0)
    timeit("B  -mirror gather       ", fB, x0)
    timeit("C  -mirror -Dgather     ", fC, x0)
    timeit("D  -Dgather (mirror on) ", fD, x0)

    # -- LJ side --------------------------------------------------------
    cells = nbr.cells

    @jax.jit
    def fE(x):
        return pair._lj_forces_pallas(x, ghosts, cells, h)

    @jax.jit
    def fF(x):
        from lammps_plugins_tpu.ops import lj_cells_pallas as ljp
        P, table = pair._cell_planes(x, ghosts, cells, h)
        F = ljp.lj_cell_forces(P, pair._lj_consts, cells.a_range,
                               cells.cell_mn, cells.cell_size)
        return jnp.sum(F[..., 0:3, :], axis=(0, 1, 2))

    P0, table0 = jax.jit(lambda x: pair._cell_planes(x, ghosts, cells, h))(x0)
    P0 = jax.block_until_ready(P0)

    @jax.jit
    def fG(P):
        from lammps_plugins_tpu.ops import lj_cells_pallas as ljp
        F = ljp.lj_cell_forces(P, pair._lj_consts, cells.a_range,
                               cells.cell_mn, cells.cell_size)
        return jnp.sum(F[..., 0:3, :], axis=(0, 1, 2))

    @jax.jit
    def fH(x):
        P, table = pair._cell_planes(x, ghosts, cells, h)
        return jnp.sum(P)

    timeit("E  LJ full              ", fE, x0)
    timeit("F  -remap scatter       ", fF, x0)
    timeit("G  kernel only (pre-P)  ", fG, P0)
    timeit("H  cell-plane pack only ", fH, x0)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(900,), daemon=True).start()
    main()
    print("# done", flush=True)
