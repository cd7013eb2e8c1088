"""LAMMPS data-file reader/writer (read_data / write_data)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lammps_plugins_tpu.api.data import read_data, write_data
from lammps_plugins_tpu.api.scenes import rebomos_bulk
from lammps_plugins_tpu.api.script import Script
from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.fixes.nve import FixNVE
from lammps_plugins_tpu.fixes.velocity import velocity_create
from lammps_plugins_tpu.potentials.rebomos import REBOMoS
from lammps_plugins_tpu.run.simulation import Engine

from conftest import REBO_FILE


def test_round_trip_triclinic_charge(tmp_path):
    st = rebomos_bulk()                       # triclinic golden scene
    st = velocity_create(st, units.METAL, 300.0, seed=5)
    q = np.linspace(-1, 1, st.natoms)
    im = np.zeros((st.natoms, 3), np.int64)
    im[3] = (1, -2, 0)
    st = st.replace(q=jnp.asarray(q, st.x.dtype),
                    image=jnp.asarray(im, jnp.int32))
    p = str(tmp_path / "golden.data")
    write_data(p, st, atom_style="charge")
    st2 = read_data(p, atom_style="charge")
    np.testing.assert_allclose(np.asarray(st2.x), np.asarray(st.x),
                               rtol=1e-15)
    np.testing.assert_allclose(np.asarray(st2.v), np.asarray(st.v),
                               rtol=1e-15)
    np.testing.assert_allclose(np.asarray(st2.q), q, rtol=1e-15)
    np.testing.assert_array_equal(np.asarray(st2.type), np.asarray(st.type))
    np.testing.assert_array_equal(np.asarray(st2.image), im)
    np.testing.assert_allclose(st2.box.h_np(), st.box.h_np(), rtol=1e-15)
    np.testing.assert_allclose(np.asarray(st2.mass), np.asarray(st.mass),
                               rtol=1e-15)


def test_hand_written_file_and_id_order(tmp_path):
    p = tmp_path / "salt.data"
    p.write_text("""salt pair  # comment

2 atoms
2 atom types
0 10.0 xlo xhi
0.0 8 ylo yhi
-1.0 7.0 zlo zhi

Masses

1 22.99
2 35.45   # Cl

Atoms # charge

2 2 -1.0 2.0 3.0 4.0
1 1 1.0 1.0 1.0 1.0 0 0 1

Velocities

2 0.5 0.0 0.0
""")
    st = read_data(str(p), atom_style="charge")
    assert st.natoms == 2
    np.testing.assert_allclose(np.asarray(st.x),
                               [[1, 1, 1], [2, 3, 4]])
    np.testing.assert_allclose(np.asarray(st.q), [1.0, -1.0])
    np.testing.assert_allclose(np.asarray(st.v)[1], [0.5, 0, 0])
    np.testing.assert_array_equal(np.asarray(st.image)[0], [0, 0, 1])
    np.testing.assert_allclose(np.asarray(st.mass), [0, 22.99, 35.45])
    assert st.box.lo_np()[2] == -1.0


def test_topology_rejected(tmp_path):
    p = tmp_path / "bonds.data"
    p.write_text("""x

1 atoms
1 atom types
3 bonds
0 1 xlo xhi
0 1 ylo yhi
0 1 zlo zhi

Atoms

1 1 0.5 0.5 0.5
""")
    with pytest.raises(ValueError, match="bonds"):
        read_data(str(p), atom_style="atomic")


def test_dsl_read_data_reproduces_golden_trajectory(tmp_path):
    """write_data the golden scene, read_data it through the DSL, run 10
    steps with rebomos — thermo must match the direct-scene engine."""
    st = rebomos_bulk()
    p = str(tmp_path / "mos2.data")
    write_data(p, st)

    pair = REBOMoS.from_file(REBO_FILE, ["M", "S"])
    eng = Engine(st, pair, [FixNVE()], units.METAL)
    rows_ref = eng.run(10, thermo_every=10)

    s = Script()
    s.run_text(f"""
units metal
boundary p p p
read_data {p}
pair_style rebomos
pair_coeff * * {REBO_FILE} M S
timestep 0.001
fix 1 all nve
thermo 10
run 10
""")
    rows = s.engine.thermo_rows
    np.testing.assert_allclose(rows[-1]["pe"], rows_ref[-1]["pe"],
                               rtol=1e-12)
    np.testing.assert_allclose(rows[-1]["temp"], rows_ref[-1]["temp"],
                               rtol=1e-12, atol=1e-12)


def test_dsl_write_data(tmp_path):
    p = str(tmp_path / "out.data")
    s = Script()
    s.run_text(f"""
units lj
lattice fcc 1.0
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 1.0
write_data {p}
""")
    st = read_data(p)
    assert st.natoms == 32
    np.testing.assert_allclose(np.asarray(st.mass), [0.0, 1.0])
