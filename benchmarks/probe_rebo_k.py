"""Probe: true rebo-tier kmax distribution for the bench.py scene.

Decides how much the K-quantum-8 change buys: the rebo [K, Np] gathers
scale linearly in K and the angular kernel quadratically.
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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
    print("# device up", flush=True)

    from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    state = rebomos_bulk_commensurate(nx=34, ny=48, nz=10,
                                      dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    state = velocity_create(state, units.METAL, 300.0, seed=12345)
    eng = Engine(state, pair, [FixNVE()], units.METAL,
                 check_every=48, skin=1.0)
    t0 = time.time()
    eng.rebuild_neighbors()
    print(f"# rebuild {time.time()-t0:.1f}s "
          f"K={ {k: v.idx.shape[1] for k, v in eng.nbr.lists.items()} }",
          flush=True)
    for name, lst in eng.nbr.lists.items():
        cnt = np.asarray(jax.jit(
            lambda m: jnp.sum(m, axis=1))(lst.mask))
        q = np.percentile(cnt, [50, 90, 99, 99.9, 100])
        print(f"# {name}: cap {lst.idx.shape[1]} kmax {int(cnt.max())} "
              f"mean {cnt.mean():.1f} p50/p90/p99/p99.9/max "
              f"{[int(v) for v in q]}", flush=True)
    c = eng.nbr.cells
    if c is not None:
        print(f"# cells dims {c.dims} C {c.table.shape[1]} "
              f"a_range {c.a_range}", flush=True)
    # after 300 hot steps, again (equilibration broadens the distribution)
    eng.run(96)
    eng.rebuild_neighbors()
    for name, lst in eng.nbr.lists.items():
        cnt = np.asarray(jax.jit(
            lambda m: jnp.sum(m, axis=1))(lst.mask))
        print(f"# hot {name}: cap {lst.idx.shape[1]} kmax {int(cnt.max())} "
              f"mean {cnt.mean():.1f}", flush=True)
    print("# done", flush=True)
    os._exit(0)


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1200,), daemon=True).start()
    main()
