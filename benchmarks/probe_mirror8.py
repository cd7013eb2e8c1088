"""Mirror gather: strip-major vs atom-major grows layout.

probe_mirror6/7 established the row-gather emitter runs ~4.8 ns/row on the
mirror index pattern but ~0.72 ns/row on the production D-gather pattern,
at ANY table size — i.e. the cost is DRAM locality of the index sequence,
not table residency.  The production mirror table is [K, Np]-flat
(flat = k' * Np + j): consecutive lanes jump strips (+-14 MB).  In
atom-major order (flat = j * K + k') the targets of consecutive lanes sit
inside a sliding ~0.7 MB window (j is a neighbor of n, |j - n| small in
cell-sorted order).

W0  strip-major indices, [K*Np, 3] table  (production today)
W1  atom-major indices, [Np*K, 3] table   (needs grows transposed)
W2  W1 + the [K,Np,3] -> [Np,K,3] transpose cost included
W3  W1 with dead slots -> zero pad row (no mirv multiply)
W4  transpose [K,Np,3] -> [Np*K,3] alone
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

    K, Np = 24, 97920
    E = K * Np
    rng = np.random.default_rng(0)

    # realistic mirror structure: mirror of edge (k, n) is (k', j) with
    # j within a +-2500 window of n (cell-sorted locality) and k' uniform
    n_arr = np.repeat(np.arange(Np), K)
    j_arr = np.clip(n_arr + rng.integers(-2500, 2501, size=E), 0, Np - 1)
    kp_arr = rng.integers(0, K, size=E)
    live = rng.random(E) < 0.7

    strip_flat = (kp_arr * Np + j_arr).astype(np.int32)     # [n, k] order
    atom_flat = (j_arr * K + kp_arr).astype(np.int32)

    # index arrays in [K, Np] layout (edge (k, n) at position k*Np+n)
    def to_kn(flat_by_edge):
        return flat_by_edge.reshape(Np, K).T.copy()

    mirT_strip = jnp.asarray(to_kn(strip_flat))
    mirT_atom = jnp.asarray(to_kn(atom_flat))
    mirT_atom_pad = jnp.asarray(
        to_kn(np.where(live, atom_flat, E).astype(np.int32)))
    mirvT = jnp.asarray(to_kn(live.astype(np.float32)))

    gx = jnp.asarray(rng.random((K, Np), np.float32))
    gy = jnp.asarray(rng.random((K, Np), np.float32))
    gz = jnp.asarray(rng.random((K, Np), np.float32))

    @jax.jit
    def w0(gx, gy, gz, mirT, mirvT):
        def body(i, acc):
            grows = jnp.stack([gx + acc, gy, gz], -1).reshape(E, 3)
            gmir = grows[mirT.reshape(-1)].reshape(K, Np, 3) \
                * mirvT[..., None]
            f = jnp.sum(jnp.stack([gx, gy, gz], -1), 0) - jnp.sum(gmir, 0)
            return acc + f[0, 0]
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    @jax.jit
    def w1(gx, gy, gz, mirT, mirvT):
        def body(i, acc):
            grows = jnp.stack([gx + acc, gy, gz], -1)       # [K, Np, 3]
            grows = grows.transpose(1, 0, 2).reshape(E, 3)  # atom-major
            gmir = grows[mirT.reshape(-1)].reshape(K, Np, 3) \
                * mirvT[..., None]
            f = jnp.sum(jnp.stack([gx, gy, gz], -1), 0) - jnp.sum(gmir, 0)
            return acc + f[0, 0]
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    @jax.jit
    def w3(gx, gy, gz, mirT):
        def body(i, acc):
            grows = jnp.stack([gx + acc, gy, gz], -1)
            grows = grows.transpose(1, 0, 2).reshape(E, 3)
            grows = jnp.concatenate(
                [grows, jnp.zeros((1, 3), grows.dtype)], 0)
            gmir = grows[mirT.reshape(-1)].reshape(K, Np, 3)
            f = jnp.sum(jnp.stack([gx, gy, gz], -1), 0) - jnp.sum(gmir, 0)
            return acc + f[0, 0]
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    @jax.jit
    def w4(gx, gy, gz):
        def body(i, acc):
            grows = jnp.stack([gx + acc, gy, gz], -1)
            grows = grows.transpose(1, 0, 2).reshape(E, 3)
            return acc + grows[0, 0]
        return lax.fori_loop(0, ITERS, body, jnp.float32(0))

    timeit("W0 strip-major (production)  ", w0,
           (gx, gy, gz, mirT_strip, mirvT))
    timeit("W1 atom-major + transpose    ", w1,
           (gx, gy, gz, mirT_atom, mirvT))
    timeit("W3 atom-major + pad-row dead ", w3, (gx, gy, gz, mirT_atom_pad))
    timeit("W4 transpose alone           ", w4, (gx, gy, gz))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(480,), daemon=True).start()
    main()
