"""BASELINE.json config 4: MoS2 monolayer at ~1M atoms, REBOMOS NVT.

Stresses neighbor rebuild + padding at the million-atom single-chip scale
(the vacuum slab has strongly anisotropic neighbor counts vs the bulk).
Prints one JSON line like bench.py.

Scale with BENCH_NX/BENCH_NY (defaults give 1,000,518 atoms — TPU only;
use e.g. BENCH_NX=20 BENCH_NY=20 for a CPU smoke).
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RESULT = {"metric": "atom-steps/sec/chip (MoS2 monolayer REBOMOS NVT, f32)",
          "value": 0.0, "unit": "atom-steps/s", "vs_baseline": 0.0}
BASELINE = 34223.0          # log.rebomos-bulk.1:59
_done = False


def _watchdog(seconds):
    time.sleep(seconds)
    if not _done:
        print(json.dumps(RESULT), flush=True)
        os._exit(0)


def main():
    global _done
    nx = int(os.environ.get("BENCH_NX", 577))
    ny = int(os.environ.get("BENCH_NY", 578))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    skin = float(os.environ.get("BENCH_SKIN", 1.0))
    reps = int(os.environ.get("BENCH_REPS", 3))

    import numpy as np
    import jax
    import jax.numpy as jnp

    # the container's sitecustomize pins JAX_PLATFORMS=axon; only an
    # in-process config update can redirect (e.g. BENCH_PLATFORM=cpu smoke)
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    t0 = time.time()
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print(f"# device warmup: {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    from lammps_plugins_tpu.api.scenes import rebomos_monolayer
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nvt import FixNVT
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    t0 = time.time()
    state = rebomos_monolayer(nx=nx, ny=ny, dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    natoms = state.natoms
    RESULT["metric"] = (f"atom-steps/sec/chip (MoS2 monolayer REBOMOS NVT, "
                        f"{natoms} atoms, f32)")
    print(f"# scene: {natoms} atoms ({time.time()-t0:.1f}s)",
          file=sys.stderr, flush=True)

    state = velocity_create(state, units.METAL, 300.0, seed=12345)
    eng = Engine(state, pair, [FixNVT(300.0, 300.0, 0.1)], units.METAL,
                 check_every=min(steps, 10), skin=skin)
    t0 = time.time()
    eng.rebuild_neighbors()
    print(f"# neighbor build: {time.time()-t0:.1f}s, "
          f"K={ {k: v.idx.shape[1] for k, v in eng.nbr.lists.items()} }, "
          f"ghosts={eng.nbr.ghosts.count}", file=sys.stderr, flush=True)

    t0 = time.time()
    pe, _ = eng.evaluate()
    print(f"# compile+first eval: {time.time()-t0:.1f}s "
          f"PE/atom={float(pe)/natoms:.4f}", file=sys.stderr, flush=True)
    t0 = time.time()
    eng.run(steps)
    print(f"# first segment (compile): {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        eng.run(steps)
        dt = time.time() - t0
        rate = natoms * steps / dt
        best = max(best, rate)
        print(f"# {steps} steps in {dt:.3f}s -> {rate:.3e} atom-steps/s",
              file=sys.stderr, flush=True)

    pe, _ = eng.evaluate()
    print(f"# final PE/atom={float(pe)/natoms:.4f}", file=sys.stderr,
          flush=True)
    RESULT["value"] = round(best, 1)
    RESULT["vs_baseline"] = round(best / BASELINE, 2)
    _done = True
    print(json.dumps(RESULT), flush=True)


if __name__ == "__main__":
    wd = int(os.environ.get("BENCH_WATCHDOG", 2400))
    threading.Thread(target=_watchdog, args=(wd,), daemon=True).start()
    main()
