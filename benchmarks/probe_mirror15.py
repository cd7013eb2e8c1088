"""Mirror-combine probe 15: unrolled-K gather-sum.

probe_mirror9-14 + the pk trace establish: a standalone gather from the
[E, 3/4] cotangent table always gets the slow component-major layout
(10.1 ms at bench shape) — XLA brackets it with relayout copies even
when the consumer is an opaque pallas_call; only gathers whose fusion
CONSUMER is elementwise run in the fast row class (~1.8-2.6 ms).

The reduction consumer is the poison, so eliminate the reduction op:
unroll the K-sum into K=20 per-slot gathers (indices [Np] each, same
total row count) whose only consumer is an elementwise add chain ending
in ONE [Np, 3/4] output.  If XLA fuses the adds+gathers into a single
loop fusion, every gather is elementwise-consumed.

  M0  production form (3 elem gathers + reduce)      [control ~10-12]
  M1  unrolled-K over [E,4] table (stack+pad in-loop), acc [Np,4]
  M4  unrolled-K over [E,3] table (stack in-loop),    acc [Np,3]
  M6  M4 with the A-side sum folded into the same output
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

    # banded mirror indices like the real rebuild (slot band, atom band)
    n_arr = np.repeat(np.arange(Np), K)
    j_arr = np.clip(n_arr + rng.integers(-2500, 2501, size=E), 0, Np - 1)
    kp_arr = rng.integers(0, K, size=E)
    flat = (kp_arr * Np + j_arr).astype(np.int32)
    mirT = jnp.asarray(flat.reshape(Np, K).T.copy())          # [K, Np]
    mirv = jnp.asarray((rng.random(E) < 0.7)
                       .astype(np.float32).reshape(Np, K).T.copy())
    mirb = mirv > 0
    # per-slot 1-D index rows + sentinel folding (row E -> zeros)
    mirS2 = jnp.where(mirb, mirT, E)                          # [K, Np]

    key = jax.random.PRNGKey(0)
    gx, gy, gz = (jax.random.normal(k, (K, Np), jnp.float32)
                  for k in jax.random.split(key, 3))
    gx, gy, gz = map(jax.block_until_ready, (gx, gy, gz))

    def loop(body, out_shape):
        def run(gx, gy, gz):
            def it(i, carry):
                gx, gy, gz, acc = carry
                f = body(gx, gy, gz)
                s = f.reshape(-1)[0] * 1e-20
                return (gx + s, gy + s, gz + s, acc + f)
            z = jnp.zeros(out_shape, jnp.float32)
            return lax.fori_loop(0, ITERS, it, (gx, gy, gz, z))[3]
        return jax.jit(run)

    def m0(gx, gy, gz):
        grows = jnp.concatenate(
            [jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3),
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        gmir = grows[mirS2.reshape(-1)].reshape(K, Np, 3)
        fx = jnp.sum(gx, 0) - jnp.sum(gmir[..., 0], 0)
        fy = jnp.sum(gy, 0) - jnp.sum(gmir[..., 1], 0)
        fz = jnp.sum(gz, 0) - jnp.sum(gmir[..., 2], 0)
        return jnp.stack([fx, fy, fz], -1)

    def m1(gx, gy, gz):
        z = jnp.zeros((K, Np), jnp.float32)
        g4 = jnp.concatenate(
            [jnp.stack([gx, gy, gz, z], axis=-1).reshape(E, 4),
             jnp.zeros((1, 4), jnp.float32)], axis=0)
        acc = g4[mirS2[0]]
        for k in range(1, K):
            acc = acc + g4[mirS2[k]]
        a = jnp.stack([jnp.sum(gx, 0), jnp.sum(gy, 0), jnp.sum(gz, 0)], -1)
        return a - acc[:, 0:3]

    def m4(gx, gy, gz):
        g3 = jnp.concatenate(
            [jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3),
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        acc = g3[mirS2[0]]
        for k in range(1, K):
            acc = acc + g3[mirS2[k]]
        a = jnp.stack([jnp.sum(gx, 0), jnp.sum(gy, 0), jnp.sum(gz, 0)], -1)
        return a - acc

    def m6(gx, gy, gz):
        # A-side rows folded into the same elementwise chain: slot k's own
        # cotangent rows are a contiguous [Np, 3] slice of the table
        g3 = jnp.concatenate(
            [jnp.stack([gx, gy, gz], axis=-1).reshape(E, 3),
             jnp.zeros((1, 3), jnp.float32)], axis=0)
        out = g3[0:Np] - g3[mirS2[0]]
        for k in range(1, K):
            out = out + (g3[k * Np:(k + 1) * Np] - g3[mirS2[k]])
        return out

    r0 = np.asarray(jax.jit(m0)(gx, gy, gz))
    for nm, fn in (("m1", m1), ("m4", m4), ("m6", m6)):
        r = np.asarray(jax.jit(fn)(gx, gy, gz))
        err = np.abs(r - r0).max()
        print(f"# {nm} vs m0 max err {err:.2e}", flush=True)

    timeit("M0 production reduce     ", loop(m0, (Np, 3)), (gx, gy, gz))
    timeit("M1 unrolled-K [E,4]      ", loop(m1, (Np, 3)), (gx, gy, gz))
    timeit("M4 unrolled-K [E,3]      ", loop(m4, (Np, 3)), (gx, gy, gz))
    timeit("M6 unrolled-K both sums  ", loop(m6, (Np, 3)), (gx, gy, gz))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(900,), daemon=True).start()
    main()
    os._exit(0)
