"""Trace the AEAM hot step on the TPU (VERDICT round-1 item 5).

32k-atom AlSi sample.in scene, NVT 863 K, f32.  Writes the xplane trace to
/tmp/jtrace_aeam.  Clean-exit watchdog (never kill externally).
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print("# warmed", flush=True)

    from lammps_plugins_tpu.api.scenes import alsi_sample
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nvt import FixNVT
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.potentials.aeam import AEAM
    from lammps_plugins_tpu.run.simulation import Engine

    state = alsi_sample(nc=20, dtype=jnp.float32)
    pair = AEAM.from_file("/root/reference/USER-AEAM/AlSi.aeam",
                          ["Al", "Si"], dtype=jnp.float32)
    state = velocity_create(state, units.METAL, 863.0, seed=4928459)
    eng = Engine(state, pair, [FixNVT(863.0, 863.0, 0.1)], units.METAL,
                 check_every=20, skin=float(os.environ.get("AEAM_SKIN", 2.0)))
    t0 = time.time()
    eng.rebuild_neighbors()
    print(f"# rebuild: {time.time()-t0:.1f}s "
          f"K={ {k: v.idx.shape[1] for k, v in eng.nbr.lists.items()} }",
          flush=True)
    t0 = time.time()
    eng.run(20)
    print(f"# compile+run20: {time.time()-t0:.1f}s", flush=True)
    # equilibrate a bit so the hot regime is the one traced
    t0 = time.time()
    eng.run(200)
    print(f"# equil 200: {time.time()-t0:.1f}s "
          f"K={ {k: v.idx.shape[1] for k, v in eng.nbr.lists.items()} }",
          flush=True)
    t0 = time.time()
    eng.run(20)
    dt = time.time() - t0
    print(f"# steady 20: {dt*50:.1f} ms/step "
          f"({state.natoms*20/dt:.3e} atom-steps/s)", flush=True)
    os.system("rm -rf /tmp/jtrace_aeam")
    with jax.profiler.trace("/tmp/jtrace_aeam"):
        eng.run(20)
        jax.block_until_ready(eng.state.x)
    print("# trace written", flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1500,), daemon=True).start()
    main()
    os._exit(0)
