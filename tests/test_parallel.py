"""Sharded-engine geometry validation.

The static-demo decomposition (parallel/spatial.py) was superseded by the
production ShardedEngine (parallel/sharded_engine.py) and removed; its
energy/force and NVE parity checks live on in tests/test_sharded.py
(test_sharded_static_parity_rebomos / test_sharded_dynamics_rebomos).
This file keeps the geometry-validation check against the production
engine.
"""

import pytest

from lammps_plugins_tpu.api.scenes import rebomos_bulk
from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.fixes.nve import FixNVE
from lammps_plugins_tpu.parallel.sharded_engine import ShardedEngine
from lammps_plugins_tpu.potentials.rebomos import REBOMoS

from conftest import REBO_FILE


def test_slab_too_narrow_raises():
    """Decomposing a box whose slabs would be thinner than the halo
    margin must fail loudly (the analogue of LAMMPS 'Domain too small
    for ghost cutoff')."""
    state = rebomos_bulk(nx=4, ny=2, nz=1, tilt_xy=0.0)
    pair = REBOMoS.from_file(REBO_FILE, ["M", "S"])
    with pytest.raises(ValueError, match="slab width"):
        ShardedEngine(state, pair, [FixNVE()], units.METAL, n_devices=8)
