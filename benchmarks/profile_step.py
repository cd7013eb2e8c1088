"""Trace the hot step on the TPU and dump per-op self-times.

Usage: python benchmarks/profile_step.py [nx ny nz]
Writes the xplane trace under /tmp/jtrace and prints the op breakdown.
Clean-exit watchdog: never kill this externally (wedges the tunnel).
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_NX", "34")
os.environ.setdefault("BENCH_NY", "48")
os.environ.setdefault("BENCH_NZ", "10")


def _watchdog(seconds):
    time.sleep(seconds)
    print("# watchdog: clean exit", flush=True)
    os._exit(0)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    t0 = time.time()
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print(f"# device warmup: {time.time()-t0:.1f}s", flush=True)

    from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    nx = int(os.environ["BENCH_NX"])
    ny = int(os.environ["BENCH_NY"])
    nz = int(os.environ["BENCH_NZ"])
    state = rebomos_bulk_commensurate(nx=nx, ny=ny, nz=nz, dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    natoms = state.natoms
    state = velocity_create(state, units.METAL, 300.0, seed=12345)
    eng = Engine(state, pair, [FixNVE()], units.METAL, check_every=20,
                 skin=1.0)
    t0 = time.time()
    eng.rebuild_neighbors()
    print(f"# neighbor build: {time.time()-t0:.1f}s "
          f"K={ {k: v.idx.shape[1] for k, v in eng.nbr.lists.items()} }",
          flush=True)
    t0 = time.time()
    eng.run(20)
    print(f"# compile+run20: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    eng.run(20)
    dt = time.time() - t0
    print(f"# steady 20 steps: {dt*50:.1f} ms/step "
          f"({natoms*20/dt:.3e} atom-steps/s)", flush=True)

    os.system("rm -rf /tmp/jtrace")
    with jax.profiler.trace("/tmp/jtrace"):
        eng.run(20)
        jax.block_until_ready(eng.state.x)
    print("# trace written", flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1200,), daemon=True).start()
    main()
    os._exit(0)
