"""Production Pallas force dispatch under LPT_PALLAS=interpret.

The suite's kernel tests (test_lj_pallas, test_select_k) call the kernels
directly; this file instead exercises the *dispatch* the real TPU bench
takes — REBOMoS.forces() routing through the [K, Np] mirror kernel path
plus the Pallas LJ cell sweep — by flipping LPT_PALLAS=interpret, the
CPU-testable escape hatch.  A regression here means the driver's TPU bench
would take a different code path than the one the suite validates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.fixes.nve import FixNVE
from lammps_plugins_tpu.potentials.rebomos import REBOMoS
from lammps_plugins_tpu.run.simulation import Engine

from conftest import REBO_FILE


@pytest.fixture(scope="module")
def eng():
    state = rebomos_bulk_commensurate(nx=3, ny=4, nz=1, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    x = np.asarray(state.x) + rng.uniform(-0.1, 0.1, state.x.shape)
    state = state.replace(x=jnp.asarray(x, jnp.float32))
    pair = REBOMoS.from_file(REBO_FILE, ["M", "S"], dtype=jnp.float32)
    e = Engine(state, pair, [FixNVE()], units.METAL, device_rebuild=True)
    e.rebuild_neighbors()
    return e


def test_interpret_dispatch_matches_reference(eng, monkeypatch):
    """forces() with LPT_PALLAS=interpret (mirror-TN kernel + Pallas LJ)
    must match the default CPU path (autodiff mirror + XLA cells)."""
    pair, st, nbr = eng.pair, eng.state, eng.nbr
    assert nbr.lists["rebo"].mirror is not None    # kernel path is live

    monkeypatch.setenv("LPT_PALLAS", "0")
    assert not pair._use_pallas(st.x)
    f_ref = np.asarray(pair.forces(st.x, st.type, nbr, st.box.h))

    monkeypatch.setenv("LPT_PALLAS", "interpret")
    assert pair._use_pallas(st.x) and pair._pallas_interpret()
    f_int = np.asarray(pair.forces(st.x, st.type, nbr, st.box.h))

    scale = np.abs(f_ref).max()
    assert scale > 1e-3
    np.testing.assert_allclose(f_int, f_ref, atol=3e-4 * scale, rtol=3e-4)


def test_interpret_sharded_forces(monkeypatch):
    """The same kernel dispatch inside shard_map: sharded static forces
    under LPT_PALLAS=interpret match the sharded reference path.  This is
    the CPU stand-in for the TPU multi-chip production configuration
    (per-shard mirror tables + cell grids feeding the Pallas kernels)."""
    from lammps_plugins_tpu.api.scenes import rebomos_bulk
    from lammps_plugins_tpu.parallel.sharded_engine import ShardedEngine

    state = rebomos_bulk(nx=12, ny=8, nz=2, tilt_xy=0.0,
                         dtype=jnp.float32)
    pair = REBOMoS.from_file(REBO_FILE, ["M", "S"], dtype=jnp.float32)

    def forces(env):
        monkeypatch.setenv("LPT_PALLAS", env)
        se = ShardedEngine(state, pair, [FixNVE()], units.METAL,
                           n_devices=4)
        se._setup_forces()
        return np.asarray(se.to_state().f)

    f_ref = forces("0")
    f_int = forces("interpret")
    scale = np.abs(f_ref).max()
    assert scale > 1e-3
    np.testing.assert_allclose(f_int, f_ref, atol=3e-4 * scale, rtol=3e-4)


def test_interpret_engine_step(eng, monkeypatch):
    """A short Engine run under the interpret dispatch stays finite and
    tracks the reference-path trajectory (same scene, same steps)."""
    import dataclasses

    def run_steps(env):
        monkeypatch.setenv("LPT_PALLAS", env)
        state = dataclasses.replace(eng.state)
        pair = eng.pair
        e = Engine(state, pair, [FixNVE()], units.METAL,
                   device_rebuild=True)
        e.run(3)
        return np.asarray(e.state.x), np.asarray(e.state.v)

    x_ref, v_ref = run_steps("0")
    x_int, v_int = run_steps("interpret")
    np.testing.assert_allclose(x_int, x_ref, atol=1e-5)
    vs = np.abs(v_ref).max()
    np.testing.assert_allclose(v_int, v_ref, atol=3e-4 * max(vs, 1e-3))


def test_windowed_mirror_combine_matches_default(monkeypatch):
    """LPT_MIRWIN=force builds windowed mirror tables (localized cyclic
    per-chunk gather operands, device_build.RebuildPlan.mirror_window);
    forces through the windowed combine must match the default
    single-gather combine exactly (same G values, same edges)."""
    state = rebomos_bulk_commensurate(nx=4, ny=6, nz=2, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = np.asarray(state.x) + rng.uniform(-0.05, 0.05, state.x.shape)
    state = state.replace(x=jnp.asarray(x, jnp.float32))
    pair = REBOMoS.from_file(REBO_FILE, ["M", "S"], dtype=jnp.float32)

    monkeypatch.setenv("LPT_PALLAS", "interpret")

    def forces(mirwin_env):
        monkeypatch.setenv("LPT_MIRWIN", mirwin_env)
        e = Engine(state, pair, [FixNVE()], units.METAL,
                   device_rebuild=True)
        e.rebuild_neighbors()
        rebo = e.nbr.lists["rebo"]
        if mirwin_env == "force":
            # the tighten pass must have enabled windowed tables
            assert rebo.mirW is not None and rebo.mirwin > 0
            assert rebo.win0 is not None
        else:
            assert rebo.mirW is None
        return np.asarray(pair.forces(e.state.x, e.state.type, e.nbr,
                                      e.state.box.h))

    f_def = forces("0")
    f_win = forces("force")
    scale = np.abs(f_def).max()
    assert scale > 1e-3
    np.testing.assert_allclose(f_win, f_def, atol=1e-6 * scale)
