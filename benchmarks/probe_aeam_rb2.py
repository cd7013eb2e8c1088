"""AEAM rebuild: trace one steady-state rebuild + neighbor-count histogram."""

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
                 check_every=12, skin=1.0)
    eng.rebuild_neighbors()
    eng.run(240)
    main_l = eng.nbr.lists["main"]
    counts = np.asarray(jnp.sum(main_l.mask, axis=1))
    print(f"# K cap {main_l.idx.shape[1]}  count max {counts.max()} "
          f"mean {counts.mean():.1f}", flush=True)
    for q in (50, 90, 99, 99.9, 99.99):
        print(f"#   p{q}: {np.percentile(counts, q):.0f}", flush=True)
    # steady-state rebuild timing + trace
    t0 = time.perf_counter()
    eng.rebuild_neighbors()
    print(f"# rebuild (warm): {(time.perf_counter()-t0)*1e3:.0f} ms",
          flush=True)
    os.system("rm -rf /tmp/jtrace_rb")
    with jax.profiler.trace("/tmp/jtrace_rb"):
        eng.rebuild_neighbors()
        jax.block_until_ready(eng.nbr.lists["main"].idx)
    print("# trace written", flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1500,), daemon=True).start()
    main()
    os._exit(0)
