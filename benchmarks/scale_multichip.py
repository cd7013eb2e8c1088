"""Atom-count scaling demonstration: 8M-atom MoS2 on the 8-device mesh.

The analogue of BASELINE config 5 (8M atoms on v5e-8), run on the virtual
CPU mesh (one host, 8 XLA CPU devices): validates that the production
sharded engine — vectorized shard packing, migration exchange, per-shard
device rebuild, sharded segments — reaches this atom count end-to-end.
Wall time on the single-core CI host is NOT a performance statement; the
per-chip TPU numbers come from bench.py.

Usage: python benchmarks/scale_multichip.py [natoms_millions]
"""
import math
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"


def _watchdog(seconds):
    time.sleep(seconds)
    print("# watchdog: clean exit", flush=True)
    os._exit(0)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.parallel.sharded_engine import ShardedEngine

    target_m = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    # 6 atoms per nx*ny*nz cell; slabs along x
    ny, nz = 64, 16
    nx = max(8, int(target_m * 1e6 / (6 * ny * nz)))
    t0 = time.time()
    state = rebomos_bulk_commensurate(nx=nx, ny=ny, nz=nz,
                                      dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    state = velocity_create(state, units.METAL, 300.0, seed=5)
    print(f"# scene: {state.natoms} atoms ({time.time()-t0:.0f}s)",
          flush=True)

    t0 = time.time()
    se = ShardedEngine(state, pair, [FixNVE()], units.METAL,
                       n_devices=8,
                       check_every=int(os.environ.get("SCALE_CHECK", 2)),
                       skin=1.0)
    print(f"# shard packing: {time.time()-t0:.0f}s "
          f"(n_cap {se.n_cap}, halo cap {se.Bh})", flush=True)

    t0 = time.time()
    se.resettle()
    print(f"# resettle (migrate+halo+rebuild, compile+run): "
          f"{time.time()-t0:.0f}s; flags "
          f"{ {k: int(v) for k, v in se._flags.items() if 'count' in k} }",
          flush=True)

    if os.environ.get("SCALE_SKIP_PE"):
        pe = float("nan")
        print("# PE phase skipped (SCALE_SKIP_PE)", flush=True)
    else:
        t0 = time.time()
        pe = se.potential_energy()
        print(f"# PE/atom {pe/state.natoms:.4f} eV ({time.time()-t0:.0f}s)",
              flush=True)

    nst = int(os.environ.get("SCALE_STEPS", 4))
    t0 = time.time()
    se.fused_loop = False
    se.run(nst)
    dt = time.time() - t0
    print(f"# {nst} sharded NVE steps: {dt:.0f}s "
          f"({state.natoms*nst/dt:.2e} atom-steps/s on 1 CPU core)",
          flush=True)
    pe2 = se.potential_energy()
    if math.isfinite(pe):
        print(f"# PE/atom after {nst} steps: {pe2/state.natoms:.6f} eV "
              f"(drift {abs(pe2-pe)/state.natoms/max(nst,1):.3e} "
              f"eV/step/atom potential-energy change)", flush=True)
    else:
        # initial PE phase was skipped: no drift to report
        print(f"# PE/atom after {nst} steps: {pe2/state.natoms:.6f} eV",
              flush=True)
    st = se.to_state()
    x = np.asarray(st.x)
    assert np.isfinite(x).all()
    assert st.natoms == state.natoms
    print(f"# OK: {st.natoms} atoms finite after sharded dynamics",
          flush=True)
    os._exit(0)


if __name__ == "__main__":
    threading.Thread(target=_watchdog,
                     args=(int(os.environ.get("SCALE_WATCHDOG", 7200)),),
                     daemon=True).start()
    main()
