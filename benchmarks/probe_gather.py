"""Micro-benchmark: TPU gather variants for the [K,N] edge pipeline.

Finds the fastest way to produce transposed edge components
dxT/dyT/dzT [K,Np] from positions [M,3] + idxT [K,Np], and the fastest
mirror gather.  Timing hygiene: arrays passed as args, block_until_ready,
several reps, median.
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
    out = jax.block_until_ready(fn(*args))     # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3, out


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print("# warmed", flush=True)

    M = 183392
    N = 97920
    K = 32
    Np = -(-N // 128) * 128
    rng = np.random.default_rng(0)
    x_all = jnp.asarray(rng.uniform(0, 150, (M, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, (N, K)).astype(np.int32))
    idxT = jnp.asarray(np.ascontiguousarray(
        np.asarray(idx).T))                     # [K, N]
    idxTp = jnp.pad(idxT, ((0, 0), (0, Np - N)))
    g3 = jnp.asarray(rng.uniform(-1, 1, (3, K, Np)).astype(np.float32))
    mirT = jnp.asarray(rng.integers(0, K * Np, (K, Np)).astype(np.int32))

    # 1. baseline row gather [E,3], flat index (round-1 style)
    f1 = jax.jit(lambda x, i: x[i.reshape(-1)])
    t, _ = bench(f1, (x_all, idx))
    print(f"1 row-gather [E,3] flat idx:            {t:8.2f} ms")

    # 1T. row gather in transposed edge order
    f1t = jax.jit(lambda x, i: x[i.reshape(-1)].reshape(K, Np, 3))
    t, _ = bench(f1t, (x_all, idxTp))
    print(f"1T row-gather [K,Np,3] transposed:      {t:8.2f} ms")

    # 2. take from [3,M] along axis 1 -> [3,K,Np]
    xT = jnp.asarray(np.ascontiguousarray(np.asarray(x_all).T))  # [3,M]
    f2 = jax.jit(lambda x, i: jnp.take(x, i, axis=1))
    t, _ = bench(f2, (xT, idxTp))
    print(f"2 take [3,M] axis1 -> [3,K,Np]:         {t:8.2f} ms")

    # 3. three standalone column element gathers [K,Np]
    f3 = jax.jit(lambda x, i: tuple(x[:, a][i] for a in range(3)))
    t, _ = bench(f3, (x_all, idxTp))
    print(f"3 three element gathers col[idxT]:      {t:8.2f} ms")

    # 4. mirror-style: [3,K,Np] -> reshape(3,-1) -> take axis1 [K,Np] idx
    f4 = jax.jit(lambda g, m: jnp.take(g.reshape(3, -1), m, axis=1))
    t, _ = bench(f4, (g3, mirT))
    print(f"4 mirror take [3,K*Np] axis1:           {t:8.2f} ms")

    # 5. mirror row-style: [K*Np,3] rows, flat idx
    gr = jnp.asarray(np.ascontiguousarray(
        np.asarray(g3).transpose(1, 2, 0).reshape(K * Np, 3)))
    f5 = jax.jit(lambda g, m: g[m.reshape(-1)].reshape(K, Np, 3))
    t, _ = bench(f5, (gr, mirT))
    print(f"5 mirror row-gather [K*Np,3]:           {t:8.2f} ms")

    # 6. fused: take + subtract center (what the step actually needs)
    xc = jnp.asarray(rng.uniform(0, 150, (3, Np)).astype(np.float32))
    f6 = jax.jit(lambda x, i, c: jnp.take(x, i, axis=1) - c[:, None, :])
    t, _ = bench(f6, (xT, idxTp, xc))
    print(f"6 take [3,M] + subtract center:         {t:8.2f} ms")

    # 7. take with [M,3] source axis 0, idxT 2-D -> [K,Np,3]
    f7 = jax.jit(lambda x, i: jnp.take(x, i, axis=0))
    t, _ = bench(f7, (x_all, idxTp))
    print(f"7 take [M,3] axis0 2-D idx -> [K,Np,3]: {t:8.2f} ms")


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(900,), daemon=True).start()
    main()
    os._exit(0)
