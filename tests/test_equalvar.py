"""Equal-style variable compiler + time-varying fix bfield end-to-end.

The reference re-evaluates equal-style B components every step via
Variable::compute_equal (fix_bfield.cpp:62-81,513-519).  Here the DSL
compiles the expression to a traceable t -> B closure; the end-to-end test
RUNS a `v_bz` deck for multiple jitted segments (the round-2 gap: the old
string-substitution lambda raised ConcretizationTypeError at trace time).
"""

import math

import numpy as np
import pytest

from lammps_plugins_tpu.api.equalvar import EqualVarError, compile_equal
from lammps_plugins_tpu.api.script import Script, ScriptError


def test_arithmetic_and_precedence():
    f = compile_equal("1 + 2*3 - 4/2")
    assert float(f(0.0)) == 5.0
    assert float(compile_equal("2^3^2")(0)) == 512.0       # right-assoc
    assert float(compile_equal("-2^2")(0)) == -4.0          # -(2^2)
    assert float(compile_equal("(1+2)*(3+4)")(0)) == 21.0
    assert float(compile_equal("2**3")(0)) == 8.0           # ** alias


def test_time_and_functions():
    f = compile_equal("5.0*sin(2*PI*time/10.0)")
    for t in (0.0, 1.7, 4.2):
        assert float(f(t)) == pytest.approx(
            5.0 * math.sin(2 * math.pi * t / 10.0), rel=1e-12)
    assert float(compile_equal("sqrt(16)")(0)) == 4.0
    assert float(compile_equal("log(100)")(0)) == pytest.approx(2.0)
    assert float(compile_equal("ln(exp(3))")(0)) == pytest.approx(3.0)
    assert float(compile_equal("floor(2.7)+ceil(2.1)")(0)) == 5.0
    assert float(compile_equal("abs(-3.5)")(0)) == 3.5


def test_variable_references_and_errors():
    vars_ = {"amp": "2.0", "wz": "v_amp*3"}
    assert float(compile_equal("v_wz + 1", vars_)(0)) == 7.0
    with pytest.raises(EqualVarError, match="Circular"):
        compile_equal("v_a", {"a": "v_b", "b": "v_a"})(0)
    with pytest.raises(EqualVarError, match="Undefined"):
        compile_equal("v_missing", {})
    with pytest.raises(EqualVarError):
        compile_equal("time +")
    with pytest.raises(EqualVarError):
        compile_equal("nosuchfunc(3)")


def test_traceable_under_jit():
    import jax
    import jax.numpy as jnp
    f = compile_equal("3.0*cos(0.5*time) + time^2")
    g = jax.jit(lambda t: f(t))
    t = jnp.asarray(1.25)
    assert float(g(t)) == pytest.approx(3.0 * math.cos(0.625) + 1.25 ** 2,
                                        rel=1e-12)


BZ_DECK = """
units metal
atom_style charge
boundary p p p
region box block 0 200 0 200 0 200 units box
create_box 1 box
create_atoms 1 single 100 100 100 units box
mass 1 1.0
set type 1 charge 1.0
pair_style none
timestep {dt}
variable bz equal {b0}*(1.0+0.5*sin(2*PI*time/{tper}))
fix 1 all bfield 0 0 v_bz
fix 2 all nve
velocity all set 0.5 0 0
run 400
run 400
"""


def test_time_varying_bz_deck_runs_and_tracks_variable():
    """`fix bfield 0 0 v_bz` runs >=2 jitted segments; the gyration phase
    must match integrating omega(t) = qBm2f*q/m*Bz(t) dt — proof the
    variable is re-evaluated inside the scanned step, not frozen at t=0
    (fix_bfield.cpp:513-519)."""
    from lammps_plugins_tpu.core import units
    u = units.METAL
    b0, m, q = 10.0, 1.0, 1.0
    omega0 = u.qBm2f * q * b0 / m
    period = 2 * math.pi / omega0
    dt = period / 2000.0
    tper = 1600 * dt      # run covers HALF a modulation period (nonzero
                          # net phase shift vs frozen B)
    s = Script(log=lambda _: None)
    s.run_text(BZ_DECK.format(dt=dt, b0=b0, tper=tper))
    eng = s.engine
    v = np.asarray(eng.state.v[0])
    # phase = integral of omega(t) dt over [0, T]; the Spreiter kick uses
    # B(t) refreshed by post_force at the END of each step, i.e. step k
    # (t_k -> t_k+dt) rotates by omega(t_k) dt with t_k = k*dt
    T = 800 * dt
    ks = np.arange(800)
    phase = float(np.sum(
        omega0 * (1.0 + 0.5 * np.sin(2 * np.pi * (ks * dt) / tper)) * dt))
    v_expect = 0.5 * np.array([math.cos(phase), -math.sin(phase)])
    assert np.allclose(v[:2], v_expect, atol=5e-3 * 0.5)
    # and it must NOT match the frozen-B answer
    frozen = 0.5 * np.array([math.cos(omega0 * T), -math.sin(omega0 * T)])
    assert not np.allclose(v[:2], frozen, atol=5e-3 * 0.5)


def test_pair_style_none_scripted_cyclotron():
    """Config-2 cyclotron as a DECK: pair_style none + fix bfield + nve
    (round-2 gap: cmd_pair_style never constructed PairNone)."""
    from lammps_plugins_tpu.core import units
    u = units.METAL
    b0, m, q = 10.0, 1.0, 1.0
    omega0 = u.qBm2f * q * b0 / m
    period = 2 * math.pi / omega0
    dt = period / 2000.0
    deck = BZ_DECK.format(dt=dt, b0=b0, tper=1.0)
    deck = deck.replace("variable bz equal "
                        f"{b0}*(1.0+0.5*sin(2*PI*time/1.0))\n", "")
    deck = deck.replace("fix 1 all bfield 0 0 v_bz",
                        f"fix 1 all bfield 0 0 {b0}")
    deck = deck.replace("run 400\nrun 400", "run 2000")
    s = Script(log=lambda _: None)
    s.run_text(deck)
    xf = np.asarray(s.engine.state.x[0])
    vf = np.asarray(s.engine.state.v[0])
    # one full gyration returns to start with |v| conserved
    assert np.linalg.norm(xf - [100.0, 100.0, 100.0]) \
        < 5e-3 * (0.5 * period)
    assert abs(np.linalg.norm(vf) - 0.5) < 1e-3 * 0.5


def test_langevin_unknown_keywords_rejected():
    s = Script(log=lambda _: None)
    s.run_text("""
units metal
atom_style atomic
boundary p p p
lattice fcc 4.05
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 26.98
""")
    with pytest.raises(ScriptError, match="langevin keywords"):
        s.command("fix 1 all langevin 300 300 0.1 48279 zero yes")


def test_thermo_keywords_env_and_detection():
    """step/temp/press/vol/pe/ke/etotal keywords (Thermo::evaluate_keyword
    via Variable::evaluate): env-mapping evaluation + .keywords detection
    + precise error when only `time` is available."""
    f = compile_equal("press*vol/2 + step")
    assert f.keywords == {"press", "vol", "step"}
    assert float(f({"press": 10.0, "vol": 4.0, "step": 3})) == 23.0
    # keyword sets propagate through v_ references
    g = compile_equal("v_a + time", {"a": "temp*2"})
    assert g.keywords == {"temp", "time"}
    assert float(g({"temp": 5.0, "time": 1.5})) == 11.5
    # a bare scalar supplies only `time`
    assert float(compile_equal("time*2")(3.0)) == 6.0
    with pytest.raises(EqualVarError, match="thermo context"):
        compile_equal("temp*2")(3.0)


def test_bfield_rejects_thermo_keyword_variable():
    s = Script(log=lambda _: None)
    s.run_text("""
units metal
atom_style charge
boundary p p p
region box block 0 10 0 10 0 10 units box
create_box 1 box
create_atoms 1 single 5 5 5 units box
mass 1 1.0
set type 1 charge 1.0
pair_style none
variable hot equal temp*0.1
""")
    with pytest.raises(ScriptError, match="thermo keyword"):
        s.command("fix 1 all bfield 0 0 v_hot")


def test_thermo_style_variable_column():
    """`thermo_style custom ... v_name` evaluates the equal-style variable
    against the thermo row (the closed config-system boundary)."""
    lines = []
    s = Script(log=lines.append)
    s.run_text("""
units metal
atom_style charge
boundary p p p
region box block 0 20 0 20 0 20 units box
create_box 1 box
create_atoms 1 single 10 10 10 units box
mass 1 1.0
pair_style none
timestep 0.001
velocity all set 1.0 0 0
fix 1 all nve
variable pv equal press*vol+step
thermo_style custom step press vol v_pv
thermo 5
run 10
""")
    rows = [ln.split() for ln in lines
            if ln.strip() and ln.split()[0].isdigit()]
    assert rows, f"no thermo rows in {lines}"
    for r in rows:
        step, press, vol, pv = (float(v) for v in r[:4])
        assert pv == pytest.approx(press * vol + step, rel=1e-6)
