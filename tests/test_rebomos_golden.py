"""THE correctness gate: reproduce log.rebomos-bulk.1 thermo rows.

The reference's only ground truth (README.md:30-33) is the golden thermo
table of the 288-atom MoS2 NVE run.  BASELINE.json sets the acceptance bar at
<= 1e-6 relative on per-step energies; we hold every printed column to its
full printed precision (the reference 4-rank MPI log is digit-identical to
the serial log, so these digits are deterministic physics, not roundoff).
"""

import numpy as np
import pytest

from lammps_plugins_tpu.api.scenes import rebomos_bulk
from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.fixes.nve import FixNVE
from lammps_plugins_tpu.potentials.rebomos import REBOMoS
from lammps_plugins_tpu.run.simulation import Engine

# log.rebomos-bulk.1:54-56 — step, temp, press, pe, ke
GOLDEN = [
    (0, 0.0, 28799.53, -2061.6112, 0.0),
    (10, 80.776057, 13540.088, -2064.6132, 2.9966028),
    (20, 146.17503, -20669.371, -2067.0428, 5.4227518),
]
GOLDEN_CELLGAMMA = 113.40187
GOLDEN_VOLUME = 5922.4926


@pytest.fixture(scope="module")
def run_rows(rebo_file):
    state = rebomos_bulk()
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    eng = Engine(state, pair, [FixNVE()], units.METAL)
    return eng.run(20, thermo_every=10)


def test_scene_matches_log(rebo_file):
    state = rebomos_bulk()
    assert state.natoms == 288                      # log:24
    t = np.asarray(state.type)
    assert (t == 1).sum() == 96 and (t == 2).sum() == 192
    _, _, gamma = state.box.cell_angles_deg()
    assert abs(float(gamma) - GOLDEN_CELLGAMMA) < 5e-6
    assert abs(float(state.box.volume) - GOLDEN_VOLUME) < 5e-4


def _rel(a, b, floor=1.0):
    return abs(a - b) / max(abs(b), floor)


def test_thermo_rows_match_golden(run_rows):
    assert [r["step"] for r in run_rows] == [0, 10, 20]
    for row, (step, g_t, g_p, g_pe, g_ke) in zip(run_rows, GOLDEN):
        # printed precision: 8 significant digits on T/PE/KE, 7-8 on press
        assert _rel(row["temp"], g_t, floor=1.0) < 5e-8, (step, row["temp"])
        assert _rel(row["pe"], g_pe) < 5e-8, (step, row["pe"])
        assert _rel(row["ke"], g_ke, floor=1e-3) < 5e-7, (step, row["ke"])
        assert abs(row["press"] - g_p) < 5e-3, (step, row["press"])
        assert abs(row["cellgamma"] - GOLDEN_CELLGAMMA) < 5e-6
        assert abs(row["vol"] - GOLDEN_VOLUME) < 5e-4


def test_energy_vs_baseline_bar(run_rows):
    """The formal BASELINE.json bar: <=1e-6 relative on per-step energies."""
    for row, (_, _, _, g_pe, _) in zip(run_rows, GOLDEN):
        assert abs(row["pe"] - g_pe) / abs(g_pe) < 1e-6
