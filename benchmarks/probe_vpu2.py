"""VPU f32 throughput roofline, take 2.

probe_vpu.py measured 0.04 Tflop/s — latency/VMEM-bound by construction
(one program, whole 64-vreg block carried through a strict fori_loop).
Here: a grid of programs, each carrying EIGHT independent (8, 128)
accumulators in registers through a fori_loop of fused fma chains.  ILP
8 per op class, no VMEM traffic inside the loop.  This is the honest
ceiling to compare the LJ cell kernel's 0.69 T op/s against.
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


LOOP = 4096
GRID = 256
NACC = 8


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print("# warmed", flush=True)

    def make(kind):
        def kernel(a_ref, o_ref):
            accs = [a_ref[...] * (1.0 + 0.001 * i) for i in range(NACC)]

            def fma_body(i, accs):
                return tuple(x * 1.000000119 + 1e-7 for x in accs)

            def rsqrt_body(i, accs):
                return tuple(jax.lax.rsqrt(x + 1.0) + 0.7 for x in accs)

            def select_body(i, accs):
                return tuple(jnp.where(x > 0.5, x * 0.25, x + 0.1)
                             for x in accs)

            body = {"fma": fma_body, "rsqrt": rsqrt_body,
                    "select": select_body}[kind]
            accs = jax.lax.fori_loop(0, LOOP, body, tuple(accs))
            out = accs[0]
            for x in accs[1:]:
                out = out + x
            o_ref[...] = out
        return kernel

    def run(kind):
        a = jnp.ones((GRID, 8, 128), jnp.float32) * 0.7

        @jax.jit
        def f(a):
            return pl.pallas_call(
                make(kind),
                grid=(GRID,),
                in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((GRID, 8, 128), jnp.float32),
            )(a)

        jax.block_until_ready(f(a))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(a))
            best = min(best, time.perf_counter() - t0)
        nv = GRID * LOOP * NACC * 1024          # elementwise ops
        if kind == "fma":
            print(f"fma   : {best*1e3:7.2f} ms -> {nv*2/best/1e12:.2f} "
                  f"Tflop/s ({nv/best/1e12:.2f} T op/s)", flush=True)
        elif kind == "rsqrt":
            print(f"rsqrt : {best*1e3:7.2f} ms -> {nv/best/1e9:.1f} "
                  f"G rsqrt/s", flush=True)
        else:
            print(f"select: {best*1e3:7.2f} ms -> {nv/best/1e9:.1f} "
                  f"G select/s", flush=True)

    for kind in ("fma", "rsqrt", "select"):
        run(kind)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(600,), daemon=True).start()
    main()
    print("# done", flush=True)
