"""Time the jitted device_rebuild in isolation at the bench scene and dump
its per-op trace.  The skin sweep showed rebuild cost dominates any smaller
skin (0.5 -> 1.47e6 vs 1.0 -> 2.52e6 atom-steps/s at 98k atoms), so the
rebuild is on the scaling-critical path for hot systems and small skins.
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
    print("# warmed", flush=True)

    from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.neighbor import device_build
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    state = rebomos_bulk_commensurate(nx=34, ny=48, nz=10, dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    state = velocity_create(state, units.METAL, 300.0, seed=12345)
    skin = float(os.environ.get("BENCH_SKIN", 1.0))
    eng = Engine(state, pair, [FixNVE()], units.METAL, skin=skin)
    t0 = time.time()
    eng.rebuild_neighbors()          # compiles + tightens the plan
    print(f"# first rebuild(+compile): {time.time()-t0:.1f}s "
          f"K={ {k: v.idx.shape[1] for k, v in eng.nbr.lists.items()} }",
          flush=True)

    plan = eng._plan
    h, h_inv, lo = eng._box_dev

    def run_once():
        xw, image, nbr, flags = device_build.device_rebuild(
            plan, eng.state.x, eng.state.image, eng.state.type,
            h, h_inv, lo, eng._cut_mats_dev)
        jax.block_until_ready(nbr.lists["rebo"].mirror)
        return flags

    run_once()
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        run_once()
        best = min(best, time.perf_counter() - t0)
    print(f"# device_rebuild: {best*1e3:.1f} ms", flush=True)

    with jax.profiler.trace("/tmp/jtrace_rebuild"):
        run_once()
        run_once()
    print("# trace written to /tmp/jtrace_rebuild", flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1200,), daemon=True).start()
    main()
    os._exit(0)
