"""Mirror gather: why does the production D-gather run 1.3 ns/row while
every probed mirror-combine form runs ~5.9 ns/row on the same row count?

probe_mirror5 eliminated table size, index locality, sortedness, row
width, and dtype.  The one structural difference left is the CONSUMER
(which drives XLA's output-layout choice for the gather fusion):

  D-gather   rows = x_all[idxT.flat].reshape(K, Np, 3)
             dx = rows[..., 0] - xT[0:1]     (per-component slices that
             feed [K, Np] elementwise math)   -> output {1,0:T(8,128)}
  mirror     gmir = grows[mirT.flat].reshape(K, Np, 3) * mirv[..., None]
             fsum = ... - jnp.sum(gmir, 0)    (3-minor reduction)
             -> XLA picks {0,1:T(4,128)} (component-planes) for both the
             gather output AND the table, splitting the row gather into
             3 element gathers with 3 separate index streams.

Variants (all same indices, same row count, K=20):
  Y0  probe5-style: sum(reshape(K,Np,3), 0)                [baseline slow]
  Y1  per-component slices feeding [K,Np] math, summed over K
  Y2  Y1 but table built in-loop from 3 planes via stack   [production G]
  Y3  Y1 with [E,4] table
  Y4  D-gather replica (small table, per-component slices) [control]
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
    M = 183424                       # owned + ghosts (D-gather table rows)
    rng = np.random.default_rng(0)

    n_arr = np.repeat(np.arange(Np), K)
    j_arr = np.clip(n_arr + rng.integers(-2500, 2501, size=E), 0, Np - 1)
    kp_arr = rng.integers(0, K, size=E)
    flat = (kp_arr * Np + j_arr).astype(np.int32)
    mirT = jnp.asarray(flat.reshape(Np, K).T.copy())          # [K, Np]
    idxD = jnp.asarray((flat % M).reshape(Np, K).T.copy())
    mirv = jnp.asarray((rng.random(E) < 0.7)
                       .astype(np.float32).reshape(Np, K).T.copy())

    key = jax.random.PRNGKey(0)
    G3 = jax.block_until_ready(jax.random.normal(key, (E, 3), jnp.float32))
    G4 = jax.block_until_ready(jax.random.normal(key, (E, 4), jnp.float32))
    Gs = jax.block_until_ready(jax.random.normal(key, (M, 3), jnp.float32))
    gx = jax.block_until_ready(jax.random.normal(key, (K, Np), jnp.float32))
    gy = gx * 1.1
    gz = gx * 0.9

    def loop(body, n_in):
        def run(*args):
            def it(i, carry):
                args, acc = carry
                f = body(*args)
                s = f.reshape(-1)[0] * 1e-20
                args = tuple(a + s.astype(a.dtype) for a in args[:n_in]) \
                    + args[n_in:]
                return (args, acc + f.astype(jnp.float32))
            z = jnp.zeros((K, Np), jnp.float32)
            return lax.fori_loop(0, ITERS, it, (args, z))[1]
        return jax.jit(run)

    def y0(G, mirT, mirv):
        gmir = G[mirT.reshape(-1)].reshape(K, Np, 3) * mirv[..., None]
        return jnp.sum(gmir, 0)[None, :, 0] + jnp.zeros((K, Np), jnp.float32)

    def y1(G, mirT, mirv):
        rows = G[mirT.reshape(-1)].reshape(K, Np, 3)
        ax = rows[..., 0] * mirv
        ay = rows[..., 1] * mirv
        az = rows[..., 2] * mirv
        return ax + ay * 1.0001 + az * 0.9999

    def y2(gx, gy, gz, mirT, mirv):
        G = jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3)
        rows = G[mirT.reshape(-1)].reshape(K, Np, 3)
        ax = rows[..., 0] * mirv
        ay = rows[..., 1] * mirv
        az = rows[..., 2] * mirv
        return ax + ay * 1.0001 + az * 0.9999

    def y3(G, mirT, mirv):
        rows = G[mirT.reshape(-1)].reshape(K, Np, 4)
        ax = rows[..., 0] * mirv
        ay = rows[..., 1] * mirv
        az = rows[..., 2] * mirv
        return ax + ay * 1.0001 + az * 0.9999

    def y4(G, idxD, mirv):
        rows = G[idxD.reshape(-1)].reshape(K, Np, 3)
        ax = rows[..., 0] * mirv
        ay = rows[..., 1] * mirv
        az = rows[..., 2] * mirv
        return ax + ay * 1.0001 + az * 0.9999

    timeit("Y0 3-minor reduce (probe5)     ", loop(y0, 1), (G3, mirT, mirv))
    timeit("Y1 per-component slices        ", loop(y1, 1), (G3, mirT, mirv))
    timeit("Y2 Y1 + in-loop stacked table  ", loop(y2, 3),
           (gx, gy, gz, mirT, mirv))
    timeit("Y3 Y1 with [E,4] table         ", loop(y3, 1), (G4, mirT, mirv))
    timeit("Y4 D-gather replica small table", loop(y4, 1), (Gs, idxD, mirv))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(480,), daemon=True).start()
    main()
    print("# done", flush=True)
