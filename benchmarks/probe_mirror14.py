"""Mirror-combine probe 14: Pallas reduction consumer (LPT_MIR=pk).

probe_mirror9-13 established: the mirror row gather runs in the fast row
class (~2.6 ms at the 98k bench shape) whenever its consumer is
elementwise, and ~10 ms whenever an XLA K-reduction consumes it (layout
propagation re-fuses the gather; optimization_barrier does not stop it).
The one consumer never tried: an opaque pallas_call doing the K-reduce
(ops/mirror_pallas.py) fed by the kernel-emitted interleaved [K, Np, 4]
table (emit_rows) — XLA cannot fuse into it, so the gather should keep
the fast class.

In-situ timing of the FULL force pass (D-gather + REBO kernel + mirror
combine + LJ cell kernel) under each mode:

  default  3x element gathers + XLA reduce     (committed form)
  rows     row gather + XLA reduce             (LPT_MIR_ROWS=1, dead end)
  pk       row gather + Pallas combine         (the new mode)

plus numeric parity of pk vs default.
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
    jax.block_until_ready(fn(*args))        # compile
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

    from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    state = rebomos_bulk_commensurate(nx=34, ny=48, nz=10, dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    state = velocity_create(state, units.METAL, 300.0, seed=12345)
    eng = Engine(state, pair, [FixNVE()], units.METAL, skin=1.0)
    eng.rebuild_neighbors()
    nbr = eng.nbr
    print(f"# N={state.natoms}", flush=True)

    x0 = jax.block_until_ready(eng.state.x)
    types = eng.state.type
    h = eng.state.box.h

    def force_loop():
        def run(x):
            def it(i, carry):
                x, acc = carry
                f = pair.forces(x, types, nbr, h)
                s = jnp.sum(f[0]) * 1e-24
                return (x + s, acc + f)
            z = jnp.zeros_like(x)
            return lax.fori_loop(0, ITERS, it, (x, z))[1]
        return jax.jit(run)

    variants = [("default (3x elem gather)", {}),
                ("rows    (row g. + XLA)  ", {"LPT_MIR_ROWS": "1"}),
                ("pk      (row g.+ Pallas)", {"LPT_MIR": "pk"})]

    results = {}
    for name, env in variants:
        for k in ("LPT_MIR", "LPT_MIR_ROWS"):
            os.environ.pop(k, None)
        os.environ.update(env)
        fn = force_loop()
        results[name] = np.asarray(jax.block_until_ready(fn(x0)))
        timeit(name, fn, (x0,))
    for k in ("LPT_MIR", "LPT_MIR_ROWS"):
        os.environ.pop(k, None)

    ref = results[variants[0][0]]
    for name, _ in variants[1:]:
        err = np.abs(results[name] - ref).max()
        rel = err / max(np.abs(ref).max(), 1e-30)
        print(f"# {name.strip()} vs default: max abs err {err:.3e} "
              f"(rel {rel:.2e})", flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1100,), daemon=True).start()
    main()
    os._exit(0)
