"""Mirror gather: bisect why the production combine missed Y2's fast layout.

probe_mirror9 Y2 (in-loop stacked [E,3] table, per-component-slice
consumer) ran ~1.84 ms; the production implementation of the same idea
(rebomos.py _rebo_forces else-branch) still traces at 10.1 ms with the
table in {0,1:T(4,128)} component planes.  Production differs from Y2 by:
  (a) a zero sentinel row appended by concat (table E+1 rows),
  (b) index select (jnp.where(mirv>0, mirT, E)) instead of a mirv multiply,
  (c) the consumer sums over K (axis 0) instead of returning [K, Np],
  (d) gx/gy/gz also feed a second consumer (the A-side sum over K).

Variants bisect these:
  Z0 exact production form (a+b+c+d)
  Z1 production minus concat: mirv multiply, E-row table (c+d)
  Z2 production minus sum consumer: elementwise out (a+b+d)
  Z3 production minus second consumer (a+b+c)
  Z4 Y2 replica (none of a-d)
  Z5 production form + table forced row-major via a Pallas identity copy
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

    def loop(body, n_in):
        def run(*args):
            def it(i, carry):
                args, acc = carry
                f = body(*args)
                s = f.reshape(-1)[0] * 1e-20
                args = tuple(a + s.astype(a.dtype) for a in args[:n_in]) \
                    + args[n_in:]
                return (args, acc + f.astype(jnp.float32))
            z = jnp.zeros((Np,), jnp.float32)
            return lax.fori_loop(0, ITERS, it, (args, z))[1]
        return jax.jit(run)

    def z0(gx, gy, gz, mirT, mirb):
        grows = jnp.concatenate(
            [jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3),
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        mirS = jnp.where(mirb, mirT, E).reshape(-1)
        gmir = grows[mirS].reshape(K, Np, 3)
        fx = jnp.sum(gx, axis=0) - jnp.sum(gmir[..., 0], axis=0)
        fy = jnp.sum(gy, axis=0) - jnp.sum(gmir[..., 1], axis=0)
        fz = jnp.sum(gz, axis=0) - jnp.sum(gmir[..., 2], axis=0)
        return fx + fy * 1.0001 + fz * 0.9999

    def z1(gx, gy, gz, mirT, mirv):
        grows = jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3)
        gmir = grows[mirT.reshape(-1)].reshape(K, Np, 3)
        fx = jnp.sum(gx, axis=0) - jnp.sum(gmir[..., 0] * mirv, axis=0)
        fy = jnp.sum(gy, axis=0) - jnp.sum(gmir[..., 1] * mirv, axis=0)
        fz = jnp.sum(gz, axis=0) - jnp.sum(gmir[..., 2] * mirv, axis=0)
        return fx + fy * 1.0001 + fz * 0.9999

    def z2(gx, gy, gz, mirT, mirb):
        grows = jnp.concatenate(
            [jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3),
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        mirS = jnp.where(mirb, mirT, E).reshape(-1)
        gmir = grows[mirS].reshape(K, Np, 3)
        ax = gx - gmir[..., 0]
        ay = gy - gmir[..., 1]
        az = gz - gmir[..., 2]
        return (ax + ay * 1.0001 + az * 0.9999)[0]

    def z3(gx, gy, gz, mirT, mirb):
        grows = jnp.concatenate(
            [jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3),
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        mirS = jnp.where(mirb, mirT, E).reshape(-1)
        gmir = grows[mirS].reshape(K, Np, 3)
        fx = jnp.sum(gmir[..., 0], axis=0)
        fy = jnp.sum(gmir[..., 1], axis=0)
        fz = jnp.sum(gmir[..., 2], axis=0)
        return fx + fy * 1.0001 + fz * 0.9999

    def z4(gx, gy, gz, mirT, mirv):
        G = jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3)
        rows = G[mirT.reshape(-1)].reshape(K, Np, 3)
        ax = rows[..., 0] * mirv
        ay = rows[..., 1] * mirv
        az = rows[..., 2] * mirv
        return (ax + ay * 1.0001 + az * 0.9999)[0]

    def _pallas_identity(t):
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(i_ref, o_ref):
            o_ref[...] = i_ref[...]

        R = t.shape[0]
        return pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec((R, 3), lambda i: (0, 0),
                                   memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((R, 3), lambda i: (0, 0),
                                   memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((R, 3), t.dtype),
        )(t)

    def z5(gx, gy, gz, mirT, mirb):
        grows = jnp.concatenate(
            [jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3),
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        grows = _pallas_identity(grows)
        mirS = jnp.where(mirb, mirT, E).reshape(-1)
        gmir = grows[mirS].reshape(K, Np, 3)
        fx = jnp.sum(gx, axis=0) - jnp.sum(gmir[..., 0], axis=0)
        fy = jnp.sum(gy, axis=0) - jnp.sum(gmir[..., 1], axis=0)
        fz = jnp.sum(gz, axis=0) - jnp.sum(gmir[..., 2], axis=0)
        return fx + fy * 1.0001 + fz * 0.9999

    timeit("Z0 exact production          ", loop(z0, 3),
           (gx, gy, gz, mirT, mirb))
    timeit("Z1 no concat (mirv mult)     ", loop(z1, 3),
           (gx, gy, gz, mirT, mirv))
    timeit("Z2 elementwise consumer      ", loop(z2, 3),
           (gx, gy, gz, mirT, mirb))
    timeit("Z3 no A-side second consumer ", loop(z3, 3),
           (gx, gy, gz, mirT, mirb))
    timeit("Z4 Y2 replica                ", loop(z4, 3),
           (gx, gy, gz, mirT, mirv))
    try:
        timeit("Z5 pallas-pinned table       ", loop(z5, 3),
               (gx, gy, gz, mirT, mirb))
    except Exception as e:
        print(f"Z5 failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(600,), daemon=True).start()
    main()
    print("# done", flush=True)
