"""Probe 18: transposed-output gathers and windowed chunked gathers.

Probe 17 found the per-index gather cost cliff: ~3.2 ns/idx for tables
<= ~131k rows (2^17) vs ~6.5 ns above, and a per-gather fixed overhead
(~2.5 ms at 490k idx).  Two candidate exploits:

  a) transposed-OUTPUT gather: out[c, e] = table[idx[e], c] via
     offset_dims=(0,) — if it stays in the fast class, the [K, Np, 3]
     -> planes relayout copy (1.33 ms/step) disappears.
  b) windowed chunking: split the 2M-index mirror gather into k chunks
     whose table windows sit under the 131k-row cliff — viable only if
     the per-gather fixed overhead at small tables is <= ~0.2 ms.
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
    import jax.lax as lax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print("# warm", flush=True)

    E = 1_958_400
    K, Np = 20, E // 20
    M = 183_392
    rng = np.random.default_rng(0)

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
        print(f"{name:56s} {dt:7.2f} ms", flush=True)
        return dt

    tab_small = jnp.asarray(rng.standard_normal((M, 3)), jnp.float32)
    tab_big = jnp.asarray(rng.standard_normal((E, 3)), jnp.float32)
    idx_small = jnp.asarray(rng.integers(0, M, E), jnp.int32)
    idx_big = jnp.asarray(rng.integers(0, E, E), jnp.int32)

    # a) transposed-output gathers
    def gT(t, i):
        g = lax.gather(
            t, i[None, :, None],
            lax.GatherDimensionNumbers(offset_dims=(0,),
                                       collapsed_slice_dims=(0,),
                                       start_index_map=(0,)),
            slice_sizes=(1, 3), mode="clip")        # out [3, E]
        return jnp.sum(g, axis=1)
    timeit("a1) [183k,3] -> out[3,E] transposed gather", gT,
           tab_small, idx_small)
    timeit("a2) [2M,3]  -> out[3,E] transposed gather", gT,
           tab_big, idx_big)

    def gRows(t, i):
        return jnp.sum(t[i], axis=0)
    timeit("a3) [183k,3] -> rows baseline", gRows, tab_small, idx_small)

    # b) chunked windowed gathers: simulate 12 / 24 chunks with windows
    # of 6k / 3k columns (table rows = K * win <= 131k)
    gx = jnp.asarray(rng.standard_normal((K, Np)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((K, Np)), jnp.float32)
    gz = jnp.asarray(rng.standard_normal((K, Np)), jnp.float32)

    for nch in (8, 12, 24):
        B = Np // nch
        WIN = min(Np, B + 2048)
        rowsW = K * WIN
        # local indices per chunk (precomputed at "rebuild")
        loc = rng.integers(0, rowsW, (nch, K * B)).astype(np.int32)
        locj = jnp.asarray(loc)
        starts = jnp.asarray(
            np.minimum(np.arange(nch) * B, Np - WIN).astype(np.int32))

        def chunked(a, b, c, li, st):
            outs = []
            for ci in range(nch):
                wa = lax.dynamic_slice(a, (0, st[ci]), (K, WIN))
                wb = lax.dynamic_slice(b, (0, st[ci]), (K, WIN))
                wc = lax.dynamic_slice(c, (0, st[ci]), (K, WIN))
                tabw = jnp.stack([wa, wb, wc], -1).reshape(K * WIN, 3)
                outs.append(jnp.sum(tabw[li[ci]], axis=0))
            return sum(outs)
        timeit(f"b) {nch} chunks, win={WIN} cols ({K*WIN//1000}k rows)",
               chunked, gx, gy, gz, locj, starts)

    # c) reference: single big gather from the same planes
    def single(a, b, c, i):
        tab = jnp.stack([a, b, c], -1).reshape(E, 3)
        return jnp.sum(tab[i], axis=0)
    timeit("c) single 2M gather from stacked planes", single,
           gx, gy, gz, idx_big)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(900,), daemon=True).start()
    main()
    os._exit(0)
