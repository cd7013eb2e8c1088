"""Spatial decomposition: sharded vs single-device equivalence.

The TPU analogue of the reference's 1-rank vs 4-rank MPI invariance check
(log.rebomos-bulk.1 vs .4 produce identical thermo rows, SURVEY.md section
4): the same system computed on 1 device and on a 4-device slab
decomposition must give the same energy and forces to reduction-order
tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from lammps_plugins_tpu.api.scenes import rebomos_bulk
from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.fixes.base import StepContext
from lammps_plugins_tpu.neighbor.build import build_neighbor_data
from lammps_plugins_tpu.parallel import spatial
from lammps_plugins_tpu.potentials.rebomos import REBOMoS


@pytest.fixture(scope="module")
def long_system(rebo_file):
    # long thin box: 4 slabs of ~19 A each >= the 12.5 A list cutoff
    state = rebomos_bulk(nx=16, ny=2, nz=1, tilt_xy=0.0)
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    return state, pair


def _single_device_efv(state, pair):
    nbr = build_neighbor_data(state.x, np.asarray(state.type), state.box,
                              pair.neighbor_requests(), skin=2.0)
    return pair.energy_force_virial(state.x, state.type, nbr, state.box.h)


def test_sharded_energy_forces_match_single(long_system):
    state, pair = long_system
    E1, F1, W1 = _single_device_efv(state, pair)

    n_dev = 4
    mesh = Mesh(np.array(jax.devices("cpu")[:n_dev]), (spatial.AXIS,))
    shards = spatial.build_shards(state, pair, n_dev, skin=2.0)
    efv = spatial.make_sharded_efv(pair, mesh, state.box.h, shards)
    E4, F4, W4 = jax.jit(efv)(shards.x)

    assert abs(float(E4) - float(E1)) < 1e-8 * abs(float(E1))
    np.testing.assert_allclose(np.asarray(W4), np.asarray(W1),
                               rtol=1e-9, atol=1e-8)

    # scatter sharded forces back to original atom order
    perm = np.asarray(shards.perm)
    F4_flat = np.asarray(F4).reshape(-1, 3)
    F4_orig = F4_flat[perm]
    np.testing.assert_allclose(F4_orig, np.asarray(F1),
                               rtol=1e-8, atol=1e-10)


def test_sharded_nve_step_matches_single(long_system):
    state, pair = long_system
    ctx = StepContext(units=units.METAL, dt=0.001)

    # single-device reference step
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.run.simulation import Engine
    eng = Engine(state, pair, [FixNVE()], units.METAL, check_every=5)
    eng.run(5)
    x1 = np.asarray(eng.state.x)

    n_dev = 4
    mesh = Mesh(np.array(jax.devices("cpu")[:n_dev]), (spatial.AXIS,))
    shards = spatial.build_shards(state, pair, n_dev, skin=2.0)
    # setup force evaluation (LAMMPS setup(): first half-kick needs f(t=0))
    efv = spatial.make_sharded_efv(pair, mesh, state.box.h, shards)
    import dataclasses as _dc
    _, F0, _ = jax.jit(efv)(shards.x)
    shards = _dc.replace(shards, f=F0)
    step = jax.jit(spatial.make_sharded_nve_step(
        pair, mesh, state.box.h, state.mass, ctx, shards))
    for _ in range(5):
        shards, E, W = step(shards)

    perm = np.asarray(shards.perm)
    x4 = np.asarray(shards.x).reshape(-1, 3)[perm]
    # positions identical up to reduction-order roundoff; single-device run
    # may wrap coordinates at rebuild, so compare modulo box translations
    h = state.box.h_np()
    d = x4 - x1
    frac = d @ np.linalg.inv(h)
    frac -= np.round(frac)
    d_min = frac @ h
    np.testing.assert_allclose(d_min, 0.0, atol=1e-8)


def test_slab_too_narrow_raises(long_system):
    state, pair = long_system
    with pytest.raises(ValueError, match="slab width"):
        spatial.build_shards(state, pair, 16, skin=2.0)
