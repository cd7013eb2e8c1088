"""Measure AEAM device-rebuild cadence + per-rebuild cost at 32k/863K."""

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

    calls = []
    orig = eng.rebuild_neighbors

    def timed(*a, **k):
        t0 = time.perf_counter()
        r = orig(*a, **k)
        calls.append(time.perf_counter() - t0)
        print(f"# rebuild #{len(calls)}: {calls[-1]*1e3:.0f} ms "
              f"K={ {n: v.idx.shape[1] for n, v in eng.nbr.lists.items()} }",
              flush=True)
        return r
    eng.rebuild_neighbors = timed

    t0 = time.time()
    eng.rebuild_neighbors()
    print(f"# first rebuild+compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    eng.run(240)
    print(f"# warmup 240 steps {time.time()-t0:.1f}s", flush=True)
    calls.clear()
    t0 = time.time()
    eng.run(120)
    dt = time.time() - t0
    print(f"# 120 steps: {dt:.2f}s ({32000*120/dt:.3e} atom-steps/s), "
          f"{len(calls)} rebuilds, "
          f"rebuild total {sum(calls):.2f}s", flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1500,), daemon=True).start()
    main()
    os._exit(0)
