"""fix langevin + FIRE minimize — the structure-prep workflow pieces.

Oracles:
  * langevin: fluctuation-dissipation — a cold LJ melt under
    `fix nve` + `fix langevin` equilibrates to the target temperature
    (the same check LAMMPS's own examples rely on); same seed => same
    trajectory (counter-based noise stream).
  * minimize: a randomly perturbed fcc LJ crystal relaxes back to the
    lattice energy with vanishing force norm (fcc sites are the T=0
    minimum of the truncated LJ at this density, so the target energy
    is known exactly from the unperturbed scene).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lammps_plugins_tpu.api.script import Script, ScriptError

SETUP = """
units           lj
atom_style      atomic
lattice         fcc 0.8442
region          box block 0 4 0 4 0 4
create_box      1 box
create_atoms    1 box
mass            1 1.0
pair_style      lj/cut 2.5
pair_coeff      1 1 1.0 1.0 2.5
neighbor        0.3 bin
"""


def _engine(extra=""):
    s = Script()
    s.run_text(SETUP + extra + "\nrun 0\n")
    return s, s.engine


def test_langevin_thermostats_cold_start():
    s, eng = _engine("""
fix             1 all nve
fix             2 all langevin 1.0 1.0 0.5 48279
thermo          100
""")
    s.cmd_run(["400"])
    rows = s.engine.thermo_rows
    assert rows[0]["temp"] == 0.0
    t_end = rows[-1]["temp"]
    assert 0.7 < t_end < 1.3, f"langevin missed target T: {t_end}"


def test_langevin_deterministic_stream():
    def final_x(seed):
        s, eng = _engine(f"""
fix             1 all nve
fix             2 all langevin 0.8 0.8 0.5 {seed}
""")
        s.cmd_run(["50"])
        return np.asarray(s.engine.state.x)

    a, b, c = final_x(12345), final_x(12345), final_x(54321)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-6


def test_langevin_ramp_window_set_by_run():
    s, eng = _engine("""
fix             1 all nve
fix             2 all langevin 0.1 1.5 0.5 999
""")
    s.cmd_run(["60"])
    fx = s.fixes[-1]
    assert (fx.begin_step, fx.end_step) == (0, 60)
    # second run command re-anchors the ramp (LAMMPS per-run semantics)
    s.cmd_run(["40"])
    assert (fx.begin_step, fx.end_step) == (60, 100)


def test_langevin_rejects_bad_args():
    from lammps_plugins_tpu.fixes.langevin import FixLangevin
    with pytest.raises(ValueError):
        FixLangevin(1.0, 1.0, -0.5, 1)
    with pytest.raises(ValueError):
        FixLangevin(1.0, 1.0, 0.5, 0)


def test_minimize_restores_perturbed_crystal():
    from lammps_plugins_tpu.run.minimize import minimize

    s, eng = _engine()
    pe_crystal, _ = eng.evaluate()
    e_lattice = float(pe_crystal)

    rng = np.random.default_rng(7)
    x = np.asarray(eng.state.x)
    eng.state = eng.state.replace(
        x=jnp.asarray(x + 0.05 * rng.standard_normal(x.shape)))
    eng._x_build_np = None
    eng._f_valid = False
    pe_pert, _ = eng.evaluate()
    assert float(pe_pert) > e_lattice + 0.1     # perturbation is real

    res = minimize(eng, etol=0.0, ftol=1e-8, maxiter=2000)
    assert res.stop_criterion == "force tolerance"
    assert res.fnorm2_final < 1e-8
    np.testing.assert_allclose(res.e_final, e_lattice, rtol=1e-9)
    # velocities zeroed for a clean post-minimize setup
    assert float(jnp.abs(eng.state.v).max()) == 0.0


def test_minimize_dsl_command():
    s = Script()
    out = s.run_text(SETUP + """
min_style       fire
minimize        0.0 1e-6 500
""")
    assert s.last_min.stop_criterion == "force tolerance"
    with pytest.raises(ScriptError):
        Script().run_text(SETUP + "min_style cg\n")


def test_compute_msd_in_thermo():
    """compute msd: zero at the reference step, grows under dynamics,
    total = sum of components (ComputeMSD semantics)."""
    s = Script()
    logged = []
    s.log = logged.append
    s.run_text(SETUP + """
velocity        all create 1.44 87287
fix             1 all nve
compute         2 all msd
thermo_style    custom step temp c_2[1] c_2[2] c_2[3] c_2[4]
thermo          40
run             40
""")
    rows = [ln.split() for ln in logged
            if ln.strip() and ln.split()[0].strip().isdigit()]
    first, last = rows[0], rows[-1]
    assert float(first[5]) == 0.0               # reference step
    comps = [float(last[k]) for k in (2, 3, 4)]
    total = float(last[5])
    assert total > 1e-6                          # atoms moved
    np.testing.assert_allclose(total, sum(comps), rtol=1e-10)


def test_minimize_energy_tolerance_stop():
    from lammps_plugins_tpu.run.minimize import minimize

    s, eng = _engine()
    rng = np.random.default_rng(11)
    x = np.asarray(eng.state.x)
    eng.state = eng.state.replace(
        x=jnp.asarray(x + 0.03 * rng.standard_normal(x.shape)))
    eng._x_build_np = None
    eng._f_valid = False
    res = minimize(eng, etol=1e-10, ftol=0.0, maxiter=2000)
    assert res.stop_criterion == "energy tolerance"
    assert res.e_final < res.e_initial
