"""VPU f32 throughput ceiling probe.

Measures sustained f32 FMA / rsqrt / select throughput of a VMEM-resident
Pallas kernel, to calibrate how far the LJ cell kernel (measured 8.9 Gflop
in 12.9 ms = 0.69 Tflop/s) sits from the hardware roof.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print("# warmed", flush=True)

    LOOP = 2048              # fori iterations; 8 ops each
    shape = (256, 256)

    def make(kind):
        def kernel(a_ref, o_ref):
            x0 = a_ref[...]

            def fma_body(i, x):
                x = x * 1.000000119 + 1e-7
                x = x * 0.999999881 - 1e-7
                x = x * 1.000000119 + 1e-7
                x = x * 0.999999881 - 1e-7
                return x

            def rsqrt_body(i, x):
                x = jax.lax.rsqrt(x * x + 1.0) + 0.7
                x = jax.lax.rsqrt(x * x + 1.0) + 0.7
                x = jax.lax.rsqrt(x * x + 1.0) + 0.7
                x = jax.lax.rsqrt(x * x + 1.0) + 0.7
                return x

            def select_body(i, x):
                x = jnp.where(x > 0.5, x * 0.25 + 0.1, x * 2.0)
                x = jnp.where(x > 0.5, x * 0.25 + 0.1, x * 2.0)
                x = jnp.where(x > 0.5, x * 0.25 + 0.1, x * 2.0)
                x = jnp.where(x > 0.5, x * 0.25 + 0.1, x * 2.0)
                return x

            body = {"fma": fma_body, "rsqrt": rsqrt_body,
                    "select": select_body}[kind]
            o_ref[...] = jax.lax.fori_loop(0, LOOP, body, x0)
        return kernel

    def run(kind):
        a = jnp.ones(shape, jnp.float32) * 0.7

        @jax.jit
        def f(a):
            return pl.pallas_call(
                make(kind),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(a)

        jax.block_until_ready(f(a))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(a))
            best = min(best, time.perf_counter() - t0)
        n = shape[0] * shape[1] * LOOP * 4      # 4 unit-ops per iteration
        if kind == "fma":
            print(f"fma   : {best*1e3:7.2f} ms -> {n*2/best/1e12:.2f} "
                  f"Tflop/s (fma=2)", flush=True)
        elif kind == "rsqrt":
            print(f"rsqrt : {best*1e3:7.2f} ms -> {n/best/1e9:.1f} "
                  f"G rsqrt/s (plus 1 fma+1 add each)", flush=True)
        else:
            print(f"select: {best*1e3:7.2f} ms -> {n/best/1e9:.1f} "
                  f"G select-chains/s (cmp+fma+mul each)", flush=True)

    for kind in ("fma", "rsqrt", "select"):
        run(kind)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(900,), daemon=True).start()
    main()
    os._exit(0)
