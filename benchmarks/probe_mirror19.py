"""Probe 19: group-packed mirror tables under the VMEM-residency cliff.

Probe 17/18 localized the gather cliff to operand PHYSICAL size (~128 MB
= (rows/8) tiles * 4 KB; rows <= ~190k of any narrow width are ~2-4x
faster per index).  A [E, 3] table is 1 GB physical (512 B/row tile
padding), but packing G atoms per row — [E/G, 3G] — shrinks it G-fold
without any spatial-locality assumption: G=16 -> 63 MB.  The consumer
then lane-selects the wanted atom (a = m mod G) out of the gathered
48-wide row.

Measures the full combine replacement: build packed table from [K, Np]
cotangent planes + gather + lane select + k-reduction -> [3, Np], vs
the production single gather.
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
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print("# warm", flush=True)

    K, Np = 20, 97_920
    E = K * Np
    rng = np.random.default_rng(0)

    gx = jnp.asarray(rng.standard_normal((K, Np)), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((K, Np)), jnp.float32)
    gz = jnp.asarray(rng.standard_normal((K, Np)), jnp.float32)
    # mirror targets: random (t, m)
    t = rng.integers(0, K, (K, Np))
    m = rng.integers(0, Np, (K, Np))

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

    # production baseline: stacked table + row gather + k-reduce
    mirT = jnp.asarray((t * Np + m).astype(np.int32))

    def baseline(a, b, c, mi):
        tab = jnp.stack([a, b, c], -1).reshape(E, 3)
        gm = tab[mi.reshape(-1)].reshape(K, Np, 3)
        own = jnp.stack([a, b, c], -1)
        return jnp.sum(own - gm, axis=0)          # [Np, 3]
    timeit("baseline: single [2M,3] gather + reduce", baseline,
           gx, gy, gz, mirT)

    for G in (8, 16, 32):
        rows = (t * (Np // G) + m // G).astype(np.int32)
        sel = (m % G).astype(np.int32)
        rowsj = jnp.asarray(rows)
        selj = jnp.asarray(sel)

        def packed(a, b, c, ri, si, G=G):
            R = Np // G
            # packed table [K*R, 3G]: comp-major lane groups
            tab = jnp.concatenate(
                [a.reshape(K, R, G), b.reshape(K, R, G),
                 c.reshape(K, R, G)], axis=-1).reshape(K * R, 3 * G)
            gm = tab[ri.reshape(-1)].reshape(K, Np, 3, G)
            oh = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, G), 3)
                  == si[:, :, None, None]).astype(a.dtype)
            gsel = jnp.sum(gm * oh, axis=-1)       # [K, Np, 3]
            own = jnp.stack([a, b, c], -1)
            return jnp.sum(own - gsel, axis=0)
        timeit(f"packed G={G} ([{K*Np//G//1000}k, {3*G}] table)", packed,
               gx, gy, gz, rowsj, selj)

    # correctness check of the packed form (G=16) vs baseline
    import numpy.testing as npt
    b0 = jax.jit(baseline)(gx, gy, gz, mirT)
    G = 16
    rows = jnp.asarray((t * (Np // G) + m // G).astype(np.int32))
    sel = jnp.asarray((m % G).astype(np.int32))
    p0 = jax.jit(lambda a, b, c, r, s: packed(a, b, c, r, s, G=16))(
        gx, gy, gz, rows, sel)
    npt.assert_allclose(np.asarray(b0), np.asarray(p0), rtol=1e-6)
    print("# packed == baseline ok", flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(900,), daemon=True).start()
    main()
    os._exit(0)
