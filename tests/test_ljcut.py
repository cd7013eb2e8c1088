"""pair_style lj/cut and lj/cut/coul/cut (BASELINE.json config 2 substrate).

Oracles: closed-form dimer energies/forces, geometric mixing rules
(LAMMPS pair_lj_cut.cpp defaults), NVE conservation on the classic LAMMPS
LJ-melt deck (bench/in.lj shape), and a charged LJ/Coulomb melt driven
under fix bfield — the interacting-system cyclotron config that
BASELINE.json config 2 names.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lammps_plugins_tpu.api.script import Script, ScriptError
from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.core.box import Box
from lammps_plugins_tpu.neighbor.build import build_neighbor_data
from lammps_plugins_tpu.potentials.ljcut import PairLJCut, PairLJCutCoulCut


def _dimer(pair, r, types=(1, 1), q=None):
    box = Box.triclinic(30.0, 31.0, 32.0)
    x = jnp.asarray([[5.0, 5.0, 5.0], [5.0 + r, 5.0, 5.0]])
    t = jnp.asarray(types, jnp.int32)
    if q is not None:
        pair.bind_charges(jnp.asarray(q, jnp.float64))
    nbr = build_neighbor_data(x, t, box, pair.neighbor_requests(), skin=1.0)
    return pair.energy_force_virial(x, t, nbr, box.h)


def test_lj_dimer_closed_form():
    eps, sig, cut = 0.7, 1.1, 3.0
    pair = PairLJCut(cut, ntypes=1)
    pair.set_coeff(1, 1, eps, sig)
    r = 1.3
    E, F, W = _dimer(pair, r)
    e_ref = 4 * eps * ((sig / r) ** 12 - (sig / r) ** 6)
    np.testing.assert_allclose(float(E), e_ref, rtol=1e-12)
    # analytic radial force on atom 1 (+x direction): -dE/dr
    dedr = 4 * eps * (-12 * sig ** 12 / r ** 13 + 6 * sig ** 6 / r ** 7)
    np.testing.assert_allclose(np.asarray(F)[1], [-dedr, 0.0, 0.0],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(F)[0], [dedr, 0.0, 0.0],
                               atol=1e-12)
    # virial trace = -r dE/dr for a dimer
    np.testing.assert_allclose(np.trace(np.asarray(W)), -r * dedr,
                               rtol=1e-10)


def test_lj_cut_is_exact_truncation():
    pair = PairLJCut(3.0, ntypes=1)
    pair.set_coeff(1, 1, 0.7, 1.1)
    E, F, _ = _dimer(pair, 3.4)   # beyond cut but within list skin
    assert float(E) == 0.0
    np.testing.assert_allclose(np.asarray(F), 0.0, atol=1e-15)


def test_lj_geometric_mixing():
    pair = PairLJCut(5.0, ntypes=2)
    pair.set_coeff(1, 1, 0.5, 1.0)
    pair.set_coeff(2, 2, 2.0, 4.0)
    E, _, _ = _dimer(pair, 2.0, types=(1, 2))
    eps = np.sqrt(0.5 * 2.0)
    sig = np.sqrt(1.0 * 4.0)
    e_ref = 4 * eps * ((sig / 2.0) ** 12 - (sig / 2.0) ** 6)
    np.testing.assert_allclose(float(E), e_ref, rtol=1e-12)


def test_missing_coeff_raises():
    pair = PairLJCut(5.0, ntypes=2)
    pair.set_coeff(1, 1, 0.5, 1.0)     # no 2-2, no 1-2
    with pytest.raises(ValueError, match="pair_coeff missing"):
        pair.neighbor_requests()


def test_coul_dimer_metal_units():
    qq = units.METAL.qqr2e
    pair = PairLJCutCoulCut(3.0, 8.0, ntypes=1, qqr2e=qq)
    pair.set_coeff(1, 1, 0.0, 1.0)     # pure coulomb (eps = 0)
    r = 4.0                            # outside LJ cut, inside coul cut
    E, F, _ = _dimer(pair, r, q=[1.0, -2.0])
    e_ref = qq * (1.0 * -2.0) / r
    np.testing.assert_allclose(float(E), e_ref, rtol=1e-12)
    dedr = -qq * (1.0 * -2.0) / r ** 2
    np.testing.assert_allclose(np.asarray(F)[1], [-dedr, 0.0, 0.0],
                               atol=1e-12)


LJ_MELT = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
velocity        all create 1.44 87287 loop geom
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
fix             1 all nve
thermo          20
run             100
"""


def test_lj_melt_nve_conservation():
    """The classic LAMMPS bench/in.lj deck shape, scaled to 256 atoms:
    reduced-density lattice semantics + NVE total-energy conservation."""
    s = Script()
    s.run_text(LJ_MELT)
    rows = s.engine.thermo_rows
    assert s.engine.state.natoms == 256
    # lattice fcc 0.8442 in lj units => a = (4/rho)^(1/3)
    a = (4 / 0.8442) ** (1 / 3.0)
    np.testing.assert_allclose(float(s.box.h_np()[0, 0]), 4 * a, rtol=1e-12)
    e0, e1 = rows[0]["etotal"], rows[-1]["etotal"]
    assert rows[-1]["step"] == 100
    assert abs(e1 - e0) / abs(e0) < 5e-3        # truncated-LJ drift level
    assert rows[-1]["temp"] > 0.5               # melted, not exploded
    assert np.isfinite([r["press"] for r in rows]).all()


CHARGED_MELT = """
units           metal
atom_style      charge
lattice         bcc 4.2
region          box block 0 4 0 4 0 4
create_box      2 box
create_atoms    1 box
set             group all type/fraction 2 0.5 777
set             type 1 charge 1.0
set             type 2 charge -1.0
mass            1 22.99
mass            2 35.45
velocity        all create 300.0 4928459
pair_style      lj/cut/coul/cut 6.0 8.0
pair_coeff      1 1 0.01 2.5
pair_coeff      2 2 0.01 3.4
neighbor        1.0 bin
fix             B all bfield 0.0 0.0 200.0
fix             1 all nve
thermo          10
run             30
"""


def test_charged_melt_bfield_config2():
    """BASELINE.json config 2: charged-ion LJ/Coulomb melt in a uniform B
    field — interacting charges driven through the Spreiter kick."""
    s = Script()
    s.run_text(CHARGED_MELT)
    st = s.engine.state
    q = np.asarray(st.q)
    t = np.asarray(st.type)
    assert set(np.unique(q)) == {1.0, -1.0}
    np.testing.assert_allclose(q[t == 1], 1.0)
    np.testing.assert_allclose(q[t == 2], -1.0)
    rows = s.engine.thermo_rows
    assert rows[-1]["step"] == 30
    for r in rows:
        assert np.isfinite(r["etotal"]) and np.isfinite(r["press"])
    assert rows[-1]["temp"] > 0.0
    # the Coulomb term must actually contribute: re-evaluate the same
    # configuration with charges zeroed and compare
    eng = s.engine
    pair0 = PairLJCutCoulCut(6.0, 8.0, ntypes=2,
                             qqr2e=units.METAL.qqr2e)
    pair0._eps, pair0._sig = eng.pair._eps, eng.pair._sig
    pair0._cut, pair0._isset = eng.pair._cut, eng.pair._isset
    pair0.bind_charges(jnp.zeros_like(st.q))
    e_q0, _, _ = pair0.energy_force_virial(st.x, st.type, eng.nbr,
                                           st.box.h)
    assert abs(rows[-1]["pe"] - float(e_q0)) > 1.0
    # bfield diagnostic output (compute_scalar/vector analogue) is live
    bf = s.fixes[0]
    vec = np.asarray(bf.vector(st))
    assert np.isfinite(vec).all()


def test_unbound_charges_raise():
    pair = PairLJCutCoulCut(3.0, ntypes=1, qqr2e=1.0)
    pair.set_coeff(1, 1, 0.1, 1.0)
    with pytest.raises(ValueError, match="charge"):
        _dimer(pair, 2.0)
