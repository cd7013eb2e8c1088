"""Find the table-size cliff of the fast row-gather emitter.

probe_mirror6: 183k-row table + pallas consumer -> 0.54 ns/row; 2.35M-row
table -> 4.8 ns/row.  This probe sweeps table row counts with the same
pallas-reduce consumer, then times the planned production form: N-way
clamp-split of the [E, 3] G table with masked accumulation.
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

    K, Np = 24, 97920
    E = K * Np
    rng = np.random.default_rng(0)
    mirT = jnp.asarray(rng.integers(0, E, size=(K, Np)).astype(np.int32))
    mirvT = jnp.asarray(rng.random((K, Np)).astype(np.float32) < 0.6)
    mirvT = mirvT.astype(jnp.float32)

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

    # --- sweep: table row count, same 2.35M output fetches ----------------
    key = jax.random.PRNGKey(0)
    for rows in (200_000, 400_000, 800_000, 1_200_000, 1_600_000, E):
        T = jax.block_until_ready(
            jax.random.normal(key, (rows, 3), jnp.float32))
        idx = jnp.asarray(np.asarray(mirT) % rows)

        def body(G, idx=idx):
            r = G[idx.reshape(-1)].reshape(K, Np, 3)
            return pall_reduce(r[..., 0] * mirvT, r[..., 1] * mirvT,
                               r[..., 2] * mirvT)[0]

        timeit(f"sweep rows={rows:>9d} ({rows*12/2**20:5.1f} MB)",
               loop(body), (T,))

    # --- planned production form: NSPLIT clamp-passes over the real table -
    for nsplit in (2, 3, 4):
        CH = -(-E // nsplit)
        G = jax.block_until_ready(
            jax.random.normal(key, (nsplit * CH, 3), jnp.float32))

        def body(G, nsplit=nsplit, CH=CH):
            mx = jnp.zeros((K, Np), jnp.float32)
            my = jnp.zeros((K, Np), jnp.float32)
            mz = jnp.zeros((K, Np), jnp.float32)
            flat = mirT
            for s in range(nsplit):
                tbl = lax.dynamic_slice(G, (s * CH, 0), (CH, 3))
                loc = flat - s * CH
                ok = ((loc >= 0) & (loc < CH)).astype(jnp.float32) * mirvT
                r = tbl[jnp.clip(loc, 0, CH - 1).reshape(-1)]
                r = r.reshape(K, Np, 3)
                mx = mx + r[..., 0] * ok
                my = my + r[..., 1] * ok
                mz = mz + r[..., 2] * ok
            return pall_reduce(mx, my, mz)[0]

        timeit(f"split nsplit={nsplit} (chunk {CH*12/2**20:5.1f} MB)",
               loop(body), (G,))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1500,), daemon=True).start()
    main()
    os._exit(0)
