"""Benchmark: atom-steps/sec/chip on ~100k-atom MoS2 REBOMOS NVE (f32).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "atom-steps/s", "vs_baseline": N}

vs_baseline is the ratio to the reference's published serial throughput of
34.223 katom-step/s on the same potential (USER-REBOMOS/log.rebomos-bulk.1:59
— its only performance number; BASELINE.md).

Robustness: the tunneled TPU backend can take minutes on first contact, so
everything host-side (scene, neighbor lists) is built before touching the
device, and a watchdog prints a fallback line if the device wedges.
"""

import json
import os
import sys
import threading
import time

RESULT = {"metric": "atom-steps/sec/chip (MoS2 REBOMOS NVE, ~99k atoms, f32)",
          "value": 0.0, "unit": "atom-steps/s", "vs_baseline": 0.0}
BASELINE = 34223.0          # log.rebomos-bulk.1:59, katom-step/s * 1000
_done = False


def _watchdog(seconds):
    time.sleep(seconds)
    if not _done:
        print(json.dumps(RESULT), flush=True)
        os._exit(0)


def main():
    global _done
    nx = int(os.environ.get("BENCH_NX", 34))
    ny = int(os.environ.get("BENCH_NY", 48))
    nz = int(os.environ.get("BENCH_NZ", 10))
    steps = int(os.environ.get("BENCH_STEPS", 50))
    # solid-phase default: thermal displacements saturate well under
    # skin/2, so rebuilds stay rare and the smaller K (24 vs 32) and
    # cell size cut the step ~13%
    skin = float(os.environ.get("BENCH_SKIN", 1.0))
    reps = int(os.environ.get("BENCH_REPS", 3))

    import numpy as np
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the heavy traces (device rebuild with
    # its top_k, the fused segment) compile once per shape and are reused
    # by every later bench invocation
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    # the tunneled backend's first device->host pull can take minutes; pay
    # it up front so it never lands inside a timed section
    t0 = time.time()
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print(f"# device warmup: {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    t0 = time.time()
    state = rebomos_bulk_commensurate(nx=nx, ny=ny, nz=nz,
                                      dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    natoms = state.natoms
    RESULT["metric"] = (f"atom-steps/sec/chip (MoS2 REBOMOS NVE, "
                        f"{natoms} atoms, f32)")
    print(f"# scene: {natoms} atoms ({time.time()-t0:.1f}s)",
          file=sys.stderr, flush=True)

    # thermal kick so the run exercises realistic neighbor churn
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    state = velocity_create(state, units.METAL, 300.0, seed=12345)

    eng = Engine(state, pair, [FixNVE()], units.METAL,
                 check_every=steps, skin=skin)
    t0 = time.time()
    eng.rebuild_neighbors()
    print(f"# neighbor build: {time.time()-t0:.1f}s, "
          f"K={ {k: v.idx.shape[1] for k, v in eng.nbr.lists.items()} }, "
          f"ghosts={eng.nbr.ghosts.count}", file=sys.stderr, flush=True)

    # warm the device + compile
    t0 = time.time()
    pe, _ = eng.evaluate()
    print(f"# compile+first eval: {time.time()-t0:.1f}s "
          f"PE/atom={float(pe)/natoms:.4f}", file=sys.stderr, flush=True)
    t0 = time.time()
    eng.run(steps)                  # compile the fused segment
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

    secs = dict(eng.timers.acc)
    tot = sum(secs.values()) or 1.0
    print("# timers: " + ", ".join(
        f"{k}={v:.2f}s ({100*v/tot:.0f}%)" for k, v in secs.items()),
        file=sys.stderr, flush=True)
    RESULT["value"] = round(best, 1)
    RESULT["vs_baseline"] = round(best / BASELINE, 2)
    _done = True
    print(json.dumps(RESULT), flush=True)


if __name__ == "__main__":
    # exit CLEANLY before any external timeout: a SIGKILLed TPU client
    # wedges the tunneled device for ~10-20 min (see memory notes), while a
    # clean exit leaves it healthy; combined with the persistent compile
    # cache, repeated invocations make monotonic progress
    wd = int(os.environ.get("BENCH_WATCHDOG", 1500))
    threading.Thread(target=_watchdog, args=(wd,), daemon=True).start()
    main()
