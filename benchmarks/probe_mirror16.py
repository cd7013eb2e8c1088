"""Probe 16: which row-gather configurations hit the fast class?

The step budget says: D-gather (x_all[idx] from [183k, 3]) runs at
~1.3 ns/index (2.58 ms for 2M indices), while the mirror gather (same
index count, table [2M, 3] built by stacking [K, Np] component planes)
runs at ~5 ns/index (10.1 ms).  Probes 1-15 varied the surrounding
pipeline; this probe isolates the GATHER ITSELF: same 2M random indices,
tables differing only in (rows, width, producer).

Findings feed the decision: can a kernel-emitted row table make the
mirror combine ride the fast class, or is the emitter's class choice
keyed to something we cannot control (operand size / producer type)?
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


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    t0 = time.time()
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print(f"# device warmup: {time.time()-t0:.1f}s", flush=True)

    E = 1_958_400            # edge count at the 98k bench (K=20)
    M_SMALL = 183_392        # x_all row count at the bench
    rng = np.random.default_rng(0)

    idx_small = jnp.asarray(rng.integers(0, M_SMALL, E), jnp.int32)
    idx_big = jnp.asarray(rng.integers(0, E, E), jnp.int32)
    # banded indices mimicking the mirror structure: |t-k| <= 5 band in
    # slot space, near-diagonal in column space
    K, Np = 20, E // 20
    t = rng.integers(0, 20, E)
    m = (np.arange(E) % Np + rng.integers(-300, 300, E)) % Np
    idx_band = jnp.asarray((t * Np + m).astype(np.int32))

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        r = f(*args)
        jax.block_until_ready(r)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:48s} {dt:7.2f} ms  ({dt*1e6/E:.2f} ns/idx)",
              flush=True)
        return dt

    # baseline: consume = sum of gathered rows
    tab_small = jnp.asarray(rng.standard_normal((M_SMALL, 3)), jnp.float32)
    tab3 = jnp.asarray(rng.standard_normal((E, 3)), jnp.float32)
    tab4 = jnp.asarray(rng.standard_normal((E, 4)), jnp.float32)
    gx = jnp.asarray(rng.standard_normal((K, Np)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((K, Np)), jnp.float32)
    gz = jnp.asarray(rng.standard_normal((K, Np)), jnp.float32)

    timeit("a) [183k,3] input table, 2M idx (D-gather)",
           lambda t_, i: jnp.sum(t_[i], axis=0), tab_small, idx_small)
    timeit("b) [2M,3] input table, 2M idx",
           lambda t_, i: jnp.sum(t_[i], axis=0), tab3, idx_big)
    timeit("b2) [2M,3] input table, banded idx",
           lambda t_, i: jnp.sum(t_[i], axis=0), tab3, idx_band)
    timeit("c) [2M,4] input table, 2M idx",
           lambda t_, i: jnp.sum(t_[i], axis=0), tab4, idx_big)
    timeit("d) [2M,3] stacked from [K,Np] planes (mirror today)",
           lambda a, b, c, i: jnp.sum(
               jnp.stack([a, b, c], -1).reshape(E, 3)[i], axis=0),
           gx, gy, gz, idx_big)
    timeit("e) [2M,3] stacked planes + opt_barrier",
           lambda a, b, c, i: jnp.sum(
               jax.lax.optimization_barrier(
                   jnp.stack([a, b, c], -1).reshape(E, 3))[i], axis=0),
           gx, gy, gz, idx_big)

    # f) Pallas-emitted [K, NB, 3] rows -> bitcast -> gather
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB = 128

    def emit3_kernel(a_ref, b_ref, c_ref, o_ref):
        o_ref[:, :, 0] = a_ref[...]
        o_ref[:, :, 1] = b_ref[...]
        o_ref[:, :, 2] = c_ref[...]

    def emit3(a, b, c):
        blk = pl.BlockSpec((K, NB), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            emit3_kernel,
            grid=(Np // NB,),
            in_specs=[blk, blk, blk],
            out_specs=pl.BlockSpec((K, NB, 3), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, Np, 3), a.dtype),
        )(a, b, c)

    def f_fn(a, b, c, i):
        rows = emit3(a, b, c).reshape(E, 3)
        return jnp.sum(rows[i], axis=0)
    timeit("f) Pallas-emitted [K,Np,3] rows -> gather", f_fn,
           gx, gy, gz, idx_big)

    # g) gather straight out of kernel-shaped [K,Np,3] without reshape
    def g_fn(a, b, c, i):
        rows = emit3(a, b, c)
        return jnp.sum(rows.reshape(-1, 3)[i], axis=0)
    timeit("g) same, reshape(-1,3)", g_fn, gx, gy, gz, idx_big)

    # h) the emit kernel alone (store cost of the padded-lane layout)
    timeit("h) emit kernel alone",
           lambda a, b, c: jnp.sum(emit3(a, b, c)), gx, gy, gz)

    # i) consume the gather with a row-major-friendly consumer
    def i_fn(a, b, c, i):
        rows = emit3(a, b, c).reshape(E, 3)
        g = rows[i].reshape(K, Np, 3)
        return jnp.sum(g, axis=(0, 2))
    timeit("i) kernel rows -> gather -> [K,Np,3] reduce", i_fn,
           gx, gy, gz, idx_big)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(900,), daemon=True).start()
    main()
    os._exit(0)
