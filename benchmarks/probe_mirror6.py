"""Mirror gather: does a Pallas-custom-call consumer flip the emitter?

The production D-gather (`x_all[idxT].reshape(K,Np,3)`, consumer = subtract
then Pallas operand) runs at 1.8 ns/row; the identically-shaped mirror
gather (consumer = mask-mul + sum over K) runs at 4.3 ns/row with a
column-major T(4,128) output.  Hypothesis: the custom call's row-major
operand requirement steers XLA's gather emitter.

W0 baseline mirror gather + XLA sum            (production pattern)
W1 gather -> component slices -> Pallas reduce kernel
W2 gather -> subtract own G -> Pallas reduce kernel
W3 lax.gather with slice_sizes=(8,3), E/8 descriptors (descriptor-rate test)
W4 production D-gather replica feeding the same Pallas reduce
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    mirvT = jnp.asarray(np.pad(ok.T.astype(np.float32),
                               ((0, 0), (0, Np - N))))
    key = jax.random.PRNGKey(0)
    G = jax.block_until_ready(jax.random.normal(key, (E, 3), jnp.float32))
    gxyz = jax.block_until_ready(
        jax.random.normal(key, (3, K, Np), jnp.float32))
    x_small = jax.block_until_ready(
        jax.random.normal(key, (183424, 3), jnp.float32))
    idx_small = jnp.asarray(np.asarray(mirT) % 183424)

    # trivial reduce kernel: out[0,:] = sum_k (a - b)
    def _red_kernel(a_ref, b_ref, c_ref, o_ref):
        o_ref[...] = (jnp.sum(a_ref[...], 0, keepdims=True)
                      + jnp.sum(b_ref[...], 0, keepdims=True)
                      + jnp.sum(c_ref[...], 0, keepdims=True))

    @jax.jit
    def pall_reduce(a, b, c):
        blk = pl.BlockSpec((K, 128), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
        oblk = pl.BlockSpec((1, 128), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _red_kernel, grid=(Np // 128,),
            in_specs=[blk, blk, blk], out_specs=oblk,
            out_shape=jax.ShapeDtypeStruct((1, Np), jnp.float32),
        )(a, b, c)

    def loop(body):
        def run(G):
            def it(i, carry):
                G, acc = carry
                f = body(G)
                s = f.reshape(-1)[0] * 1e-20
                return (G + s.astype(G.dtype), acc + f.astype(jnp.float32))
            z = jnp.zeros((Np,), jnp.float32)
            return lax.fori_loop(0, ITERS, it, (G, z))[1]
        return jax.jit(run)

    def w0(G):
        rows = G[mirT.reshape(-1)].reshape(K, Np, 3)
        gmir = rows * mirvT[..., None]
        return jnp.sum(jnp.sum(gmir, axis=0), axis=-1)

    def w1(G):
        rows = G[mirT.reshape(-1)].reshape(K, Np, 3)
        mx = rows[..., 0] * mirvT
        my = rows[..., 1] * mirvT
        mz = rows[..., 2] * mirvT
        return pall_reduce(mx, my, mz)[0]

    def w2(G):
        rows = G[mirT.reshape(-1)].reshape(K, Np, 3)
        mx = gxyz[0] - rows[..., 0] * mirvT
        my = gxyz[1] - rows[..., 1] * mirvT
        mz = gxyz[2] - rows[..., 2] * mirvT
        return pall_reduce(mx, my, mz)[0]

    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))
    starts8 = (jnp.arange(E // 8, dtype=jnp.int32) * 8).reshape(-1, 1)

    def w3(G):
        blocks = lax.gather(G, starts8, dn, slice_sizes=(8, 3))
        return jnp.sum(jnp.sum(blocks, axis=1), axis=-1)[:Np]

    def w4(G):
        rows = x_small[idx_small.reshape(-1)].reshape(K, Np, 3)
        mx = rows[..., 0] * mirvT
        my = rows[..., 1] * mirvT
        mz = rows[..., 2] * mirvT
        return pall_reduce(mx, my, mz)[0]

    timeit("W0 mirror + XLA sum             ", loop(w0), (G,))
    timeit("W1 mirror -> pallas reduce      ", loop(w1), (G,))
    timeit("W2 mirror -> sub -> pallas      ", loop(w2), (G,))
    timeit("W3 slice_sizes (8,3) blocks     ", loop(w3), (G,))
    timeit("W4 small-table -> pallas        ", loop(w4), (G,))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1200,), daemon=True).start()
    main()
    os._exit(0)
