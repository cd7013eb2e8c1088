"""Units, box/PBC, and lattice construction unit tests."""

import jax.numpy as jnp
import numpy as np

from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.core.box import Box
from lammps_plugins_tpu.core.lattice import Lattice, create_atoms_box


def test_metal_units():
    m = units.get("metal")
    assert m.boltz == 8.617343e-5
    assert m.mvv2e == 1.0364269e-4
    assert abs(m.ftm2v * m.mvv2e - 1.0) < 1e-15
    assert m.nktv2p == 1.6021765e6
    assert m.dt == 0.001
    # fix_bfield.cpp:186-188
    assert abs(m.qBm2f - 1.60217646e-19 / 1.66054e-27 / 1e12) < 1e-6


def test_box_wrap_orthogonal():
    box = Box.orthogonal([10.0, 20.0, 30.0])
    x = jnp.array([[11.0, -1.0, 29.0], [5.0, 5.0, 5.0]])
    xw, img = box.wrap(x)
    np.testing.assert_allclose(np.asarray(xw),
                               [[1.0, 19.0, 29.0], [5.0, 5.0, 5.0]],
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(img),
                                  [[1, -1, 0], [0, 0, 0]])
    # unmap restores the continuous coordinates
    np.testing.assert_allclose(np.asarray(box.unmap(xw, img)),
                               np.asarray(x), atol=1e-12)


def test_box_triclinic_roundtrip():
    box = Box.triclinic(19.147, 22.121, 13.98, xy=-9.57)
    f = jnp.array([[0.3, 0.9, 0.1], [0.99, 0.01, 0.7]])
    x = box.from_fractional(f)
    np.testing.assert_allclose(np.asarray(box.to_fractional(x)),
                               np.asarray(f), atol=1e-12)
    # closed-form inverse vs numpy
    np.testing.assert_allclose(np.asarray(box.h_inv),
                               np.linalg.inv(np.asarray(box.h)), atol=1e-14)


def test_perpendicular_widths():
    box = Box.orthogonal([2.0, 3.0, 4.0])
    np.testing.assert_allclose(np.asarray(box.perpendicular_widths()),
                               [2.0, 3.0, 4.0], atol=1e-12)


def test_fcc_lattice_count():
    lat = Lattice.fcc(4.045)
    box = Box.orthogonal([4.045 * 4] * 3)
    pos, types = create_atoms_box(lat, box, [1, 1, 1, 1])
    assert len(pos) == 4 * 4 ** 3          # 4 atoms/cell * 64 cells
    # all atoms strictly inside
    frac = np.asarray(pos) / (4.045 * 4)
    assert frac.min() >= 0 and frac.max() < 1


def test_custom_lattice_spacings_match_log():
    """log.rebomos-bulk.1:17 prints 4.7867748 2.7651482 13.982768."""
    from lammps_plugins_tpu.api.scenes import mos2_lattice
    s = mos2_lattice().spacings()
    np.testing.assert_allclose(s, [4.7867748, 2.7651482, 13.982768],
                               atol=5e-7)


def test_pressure_tensor_thermo_columns():
    """pxx/pyy/pzz diagonal averages to press; lx/ly/lz match the box
    (thermo.cpp custom keywords)."""
    import jax
    from lammps_plugins_tpu.api.scenes import rebomos_bulk
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    state = rebomos_bulk()
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"])
    eng = Engine(state, pair, [FixNVE()], units.METAL)
    r = eng.run(0, thermo_every=1)[0]
    assert abs(r["press"] - (r["pxx"] + r["pyy"] + r["pzz"]) / 3) \
        < 1e-9 * abs(r["press"])
    assert abs(float(r["lx"]) - float(state.box.h[0, 0])) < 1e-12
    assert abs(float(r["vol"])
               - float(r["lx"] * r["ly"] * r["lz"])) < 1e-6 * float(r["vol"])
