"""Does Mosaic lower dynamic gathers inside a Pallas TPU kernel, and at
what rate?  If an in-VMEM gather runs near vector rate, the mirror-edge
combine (10 ms of XLA row-gather at 98k atoms) could move into a windowed
Pallas kernel at ~2 ms.

Tested forms, each first for lowering success, then for throughput:
  A  take_along_axis(tbl[S,128], idx[S,128], axis=0)   (sublane gather)
  B  take_along_axis(tbl[8,W],  idx[8,128], axis=1)    (lane gather)
  C  tbl[idx] row indexing                              (jnp fancy)
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

    LOOP = 512

    def bench(name, S, W, kind):
        rng = np.random.default_rng(0)
        tbl = jnp.asarray(rng.random((S, W)).astype(np.float32))
        if kind == "A":                     # gather along sublanes
            idx = jnp.asarray(rng.integers(0, S, (8, 128)).astype(np.int32))
        else:                               # gather along lanes
            idx = jnp.asarray(rng.integers(0, W, (8, 128)).astype(np.int32))

        def kernel(t_ref, i_ref, o_ref):
            t = t_ref[...]
            i0 = i_ref[...]

            def body(n, carry):
                acc, i = carry
                if kind == "A":
                    g = jnp.take_along_axis(
                        t[:, :128], jnp.clip(i, 0, S - 1), axis=0)
                elif kind == "B":
                    g = jnp.take_along_axis(
                        t[:8, :], jnp.clip(i, 0, W - 1), axis=1)
                else:
                    g = t[jnp.clip(i[0], 0, S - 1)][:8, :128]
                i = i + 1
                return acc + g, i

            acc, _ = jax.lax.fori_loop(0, LOOP, body,
                                       (jnp.zeros((8, 128), jnp.float32),
                                        i0))
            o_ref[...] = acc

        @jax.jit
        def f(tbl, idx):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tbl, idx)

        try:
            jax.block_until_ready(f(tbl, idx))
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{name}: LOWERING FAILED: {msg}", flush=True)
            return
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(tbl, idx))
            best = min(best, time.perf_counter() - t0)
        n = 8 * 128 * LOOP
        print(f"{name}: {best*1e3:7.3f} ms -> {best/n*1e9:7.3f} ns/elem",
              flush=True)

    bench("A  sublane tbl[  8,128]", 8, 128, "A")
    bench("A  sublane tbl[512,128]", 512, 128, "A")
    bench("A  sublane tbl[4096,128]", 4096, 128, "A")
    bench("B  lane    tbl[8,  128]", 8, 128, "B")
    bench("B  lane    tbl[8, 2048]", 8, 2048, "B")
    bench("C  fancy   tbl[512,128]", 512, 128, "C")


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(900,), daemon=True).start()
    main()
    os._exit(0)
