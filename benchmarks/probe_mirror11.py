"""Mirror gather: does an optimization_barrier between the gathered
component planes and the sum-over-K recover the fast row-major layout?

probe_mirror10 showed every form that ends in a K-reduction runs ~11.8 ms
(XLA fuses the reduce into the gather and picks component-plane layouts),
while probe_mirror9's Y2 — identical gather, but consumed elementwise at
[K, Np] — ran 1.84 ms.  The reduction is what flips the layout.  Variants:

  W0 production form (reduce fused)                 [expect ~11.8]
  W1 production + optimization_barrier(ax, ay, az) before the K-sums
  W2 W1 but barrier on the raw gmir [K, Np, 3]
  W3 mirror9 Y2 exact replica ([K, Np] accumulator) [control ~1.84]
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

    K, Np = 20, 97920
    E = K * Np
    rng = np.random.default_rng(0)

    n_arr = np.repeat(np.arange(Np), K)
    j_arr = np.clip(n_arr + rng.integers(-2500, 2501, size=E), 0, Np - 1)
    kp_arr = rng.integers(0, K, size=E)
    flat = (kp_arr * Np + j_arr).astype(np.int32)
    mirT = jnp.asarray(flat.reshape(Np, K).T.copy())          # [K, Np]
    mirv = jnp.asarray((rng.random(E) < 0.7)
                       .astype(np.float32).reshape(Np, K).T.copy())
    mirb = mirv > 0

    key = jax.random.PRNGKey(0)
    gx = jax.block_until_ready(jax.random.normal(key, (K, Np), jnp.float32))
    gy = gx * 1.1
    gz = gx * 0.9

    def loop(body, n_in, acc_shape):
        def run(*args):
            def it(i, carry):
                args, acc = carry
                f = body(*args)
                s = f.reshape(-1)[0] * 1e-20
                args = tuple(a + s.astype(a.dtype) for a in args[:n_in]) \
                    + args[n_in:]
                return (args, acc + f.astype(jnp.float32))
            z = jnp.zeros(acc_shape, jnp.float32)
            return lax.fori_loop(0, ITERS, it, (args, z))[1]
        return jax.jit(run)

    def w0(gx, gy, gz, mirT, mirb):
        grows = jnp.concatenate(
            [jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3),
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        mirS = jnp.where(mirb, mirT, E).reshape(-1)
        gmir = grows[mirS].reshape(K, Np, 3)
        fx = jnp.sum(gx, axis=0) - jnp.sum(gmir[..., 0], axis=0)
        fy = jnp.sum(gy, axis=0) - jnp.sum(gmir[..., 1], axis=0)
        fz = jnp.sum(gz, axis=0) - jnp.sum(gmir[..., 2], axis=0)
        return fx + fy * 1.0001 + fz * 0.9999

    def w1(gx, gy, gz, mirT, mirb):
        grows = jnp.concatenate(
            [jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3),
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        mirS = jnp.where(mirb, mirT, E).reshape(-1)
        gmir = grows[mirS].reshape(K, Np, 3)
        ax, ay, az = lax.optimization_barrier(
            (gmir[..., 0], gmir[..., 1], gmir[..., 2]))
        fx = jnp.sum(gx, axis=0) - jnp.sum(ax, axis=0)
        fy = jnp.sum(gy, axis=0) - jnp.sum(ay, axis=0)
        fz = jnp.sum(gz, axis=0) - jnp.sum(az, axis=0)
        return fx + fy * 1.0001 + fz * 0.9999

    def w2(gx, gy, gz, mirT, mirb):
        grows = jnp.concatenate(
            [jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3),
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        mirS = jnp.where(mirb, mirT, E).reshape(-1)
        gmir = lax.optimization_barrier(grows[mirS].reshape(K, Np, 3))
        fx = jnp.sum(gx, axis=0) - jnp.sum(gmir[..., 0], axis=0)
        fy = jnp.sum(gy, axis=0) - jnp.sum(gmir[..., 1], axis=0)
        fz = jnp.sum(gz, axis=0) - jnp.sum(gmir[..., 2], axis=0)
        return fx + fy * 1.0001 + fz * 0.9999

    def w3(gx, gy, gz, mirT, mirv):
        G = jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3)
        rows = G[mirT.reshape(-1)].reshape(K, Np, 3)
        ax = rows[..., 0] * mirv
        ay = rows[..., 1] * mirv
        az = rows[..., 2] * mirv
        return ax + ay * 1.0001 + az * 0.9999

    timeit("W0 production (fused reduce)  ", loop(w0, 3, (Np,)),
           (gx, gy, gz, mirT, mirb))
    timeit("W1 barrier on planes          ", loop(w1, 3, (Np,)),
           (gx, gy, gz, mirT, mirb))
    timeit("W2 barrier on [K,Np,3]        ", loop(w2, 3, (Np,)),
           (gx, gy, gz, mirT, mirb))
    timeit("W3 mirror9 Y2 exact control   ", loop(w3, 3, (K, Np)),
           (gx, gy, gz, mirT, mirv))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(480,), daemon=True).start()
    main()
    print("# done", flush=True)
