"""REBOMOS unit tests: file parsing, inline math, force consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from lammps_plugins_tpu.potentials import rebomos as R
from lammps_plugins_tpu.potentials.tables import read_rebomos
from lammps_plugins_tpu.potentials.rebomos import REBOMoS
from lammps_plugins_tpu.neighbor.build import build_neighbor_data
from lammps_plugins_tpu.api.scenes import rebomos_bulk


def test_read_rebomos_literals(rebo_file):
    """Spot-check against literal values in MoS.REBO.set5b."""
    t = read_rebomos(rebo_file)
    assert t.rcmin[0, 0] == 3.50              # line 5
    assert t.rcmin[0, 1] == 2.75
    assert t.rcmax[1, 1] == 3.00              # line 10
    assert abs(t.Q[0, 0] - 3.419129390005910) < 1e-15
    assert abs(t.A[1, 1] - 1228.43233679426) < 1e-10
    assert abs(t.b[0, 0] - 0.1326842550663270) < 1e-15   # M_b0
    assert abs(t.bg[1, 1] - 1.67102480) < 1e-15          # S_bg1
    assert abs(t.a[1, 3] - 2.386431372486710) < 1e-15    # S_a3
    assert t.epsilon[0, 0] == 0.00058595                  # line 62
    assert t.sigma[1, 1] == 3.130
    # mixing rules (pair_rebomos.cpp:1048-1056)
    assert abs(t.sigma[0, 1] - (4.2 + 3.13) / 2) < 1e-15
    assert abs(t.epsilon[0, 1] - np.sqrt(0.00058595 * 0.01386)) < 1e-18
    assert abs(t.rcLJmax[0, 0] - 2.5 * 4.2) < 1e-12
    assert abs(t.cut3rebo - 11.4) < 1e-12


def test_sp_cutoff_values_and_continuity():
    r = jnp.linspace(2.0, 4.5, 1001)
    w = R.sp_cutoff(r, 3.5, 3.8)
    assert float(w[0]) == 1.0
    assert float(w[-1]) == 0.0
    mid = R.sp_cutoff(jnp.array(3.65), 3.5, 3.8)
    assert abs(float(mid) - 0.5 * (1 + np.cos(0.5 * np.pi))) < 1e-14
    # derivative continuity at the branch points (C1)
    g = jax.grad(lambda x: R.sp_cutoff(x, 3.5, 3.8))
    assert abs(float(g(jnp.array(3.5 + 1e-9)))) < 1e-5
    assert abs(float(g(jnp.array(3.8 - 1e-9)))) < 1e-5


def test_g_spline_matches_direct_polynomial(rebo_file):
    t = read_rebomos(rebo_file)
    b = jnp.asarray(t.b)
    bg = jnp.asarray(t.bg)
    for el in (0, 1):
        for c in (-0.9, -0.3, 0.2, 0.499999, 0.5, 0.7, 1.0):
            got = float(R.g_spline(jnp.array(c), b[el], bg[el]))
            gcos = sum(t.b[el][k] * c ** k for k in range(7))
            if c < 0.5:
                want = gcos
            else:
                gam = sum(t.bg[el][k] * c ** k for k in range(7))
                psi = 0.5 * (1 - np.cos(2 * np.pi * (c - 0.5)))
                want = gcos + psi * (gam - gcos)
            assert abs(got - want) < 1e-12, (el, c)


def test_p_coord_closed_form(rebo_file):
    t = read_rebomos(rebo_file)
    a = jnp.asarray(t.a)
    for el in (0, 1):
        for nm, ns in ((0.0, 0.0), (2.0, 4.0), (1.5, 0.3)):
            got = float(R.p_coord(jnp.array(nm), jnp.array(ns), a[el]))
            N = nm + ns
            want = (-t.a[el][0] * (N - 1) - t.a[el][1]
                    * np.exp(-t.a[el][2] * N) + t.a[el][3])
            assert abs(got - want) < 1e-12


def test_forces_match_finite_difference(rebo_file):
    """Autodiff forces vs central finite differences of the energy."""
    state = rebomos_bulk()
    # perturb off the symmetric lattice
    rng = np.random.default_rng(42)
    x = np.asarray(state.x) + rng.normal(scale=0.03, size=(288, 3))
    x = jnp.asarray(x)
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    nbr = build_neighbor_data(x, np.asarray(state.type), state.box,
                              pair.neighbor_requests(), skin=2.0)
    E, F, W = pair.energy_force_virial(x, state.type, nbr, state.box.h)
    F = np.asarray(F)

    eps = 1e-6
    for (i, d) in [(0, 0), (7, 1), (100, 2), (250, 0)]:
        xp = x.at[i, d].add(eps)
        xm = x.at[i, d].add(-eps)
        Ep = pair.energy(xp, jnp.zeros((3, 3)), state.type, nbr, state.box.h)
        Em = pair.energy(xm, jnp.zeros((3, 3)), state.type, nbr, state.box.h)
        fd = -(float(Ep) - float(Em)) / (2 * eps)
        assert abs(fd - F[i, d]) < 1e-6 * max(1.0, abs(F[i, d])), (i, d)


def test_newtons_third_law(rebo_file):
    """Total force must vanish (translation invariance of E)."""
    state = rebomos_bulk()
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.asarray(state.x)
                    + rng.normal(scale=0.05, size=(288, 3)))
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    nbr = build_neighbor_data(x, np.asarray(state.type), state.box,
                              pair.neighbor_requests(), skin=2.0)
    _, F, _ = pair.energy_force_virial(x, state.type, nbr, state.box.h)
    assert float(jnp.abs(jnp.sum(F, axis=0)).max()) < 1e-9


def test_chunked_energy_core_matches_single_shot():
    """The row-chunked + rematerialized REBO energy path (used when the
    [N,K,K] angular tensors would exceed the memory threshold) must agree
    with the single-shot path for energy, forces, and virial."""
    import numpy as np
    from lammps_plugins_tpu.api.scenes import rebomos_bulk
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    state = rebomos_bulk()
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"])
    eng = Engine(state, pair, [FixNVE()], units.METAL)
    pe1, _ = eng.evaluate()
    f1 = np.asarray(eng.state.f)
    r1 = eng.run(0, thermo_every=1)[0]

    old = (REBOMoS._CHUNK_ELEMS, REBOMoS._CHUNK_ROWS)
    try:
        REBOMoS._CHUNK_ELEMS = 1
        REBOMoS._CHUNK_ROWS = 37          # non-divisor: exercises padding
        eng2 = Engine(state, pair, [FixNVE()], units.METAL)
        pe2, _ = eng2.evaluate()
        f2 = np.asarray(eng2.state.f)
        r2 = eng2.run(0, thermo_every=1)[0]
    finally:
        REBOMoS._CHUNK_ELEMS, REBOMoS._CHUNK_ROWS = old

    assert abs(float(pe2 - pe1)) < 1e-9
    assert np.abs(f2 - f1).max() < 1e-10
    assert abs(float(r2["press"] - r1["press"])) < 1e-6
