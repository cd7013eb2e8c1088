"""On-device jitted neighbor rebuild vs exact host build."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from lammps_plugins_tpu.api.scenes import rebomos_bulk
from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.fixes.nve import FixNVE
from lammps_plugins_tpu.potentials.rebomos import REBOMoS
from lammps_plugins_tpu.run.simulation import Engine

GOLDEN = [(0, 0.0, -2061.6112), (10, 80.776057, -2064.6132),
          (20, 146.17503, -2067.0428)]


def test_device_rebuild_matches_host_energy(rebo_file):
    """Same energy/forces whether lists come from the host numpy build or
    the jitted device rebuild (different padding, same physics)."""
    state = rebomos_bulk()
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])

    eng_h = Engine(state, pair, [FixNVE()], units.METAL,
                   device_rebuild=False)
    pe_h, w_h = eng_h.evaluate()
    f_h = np.asarray(eng_h.state.f)

    eng_d = Engine(state, pair, [FixNVE()], units.METAL,
                   device_rebuild=True)
    pe_d, w_d = eng_d.evaluate()
    f_d = np.asarray(eng_d.state.f)

    assert abs(float(pe_d) - float(pe_h)) < 1e-9 * abs(float(pe_h))
    np.testing.assert_allclose(f_d, f_h, rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(w_d), np.asarray(w_h),
                               rtol=1e-10, atol=1e-9)


def test_device_rebuild_golden_run(rebo_file):
    """The golden 20-step run is unchanged under the device-rebuild path."""
    state = rebomos_bulk()
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    eng = Engine(state, pair, [FixNVE()], units.METAL, device_rebuild=True,
                 check_every=5)
    rows = eng.run(20, thermo_every=10)
    for row, (step, g_t, g_pe) in zip(rows, GOLDEN):
        assert abs(row["temp"] - g_t) < 5e-6 * max(1.0, g_t)
        assert abs(row["pe"] - g_pe) / abs(g_pe) < 1e-7


def test_overflow_recovery(rebo_file):
    """Force tiny capacities; the engine must detect overflow and re-size."""
    from lammps_plugins_tpu.neighbor import device_build

    state = rebomos_bulk()
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    eng = Engine(state, pair, [FixNVE()], units.METAL, device_rebuild=True)
    eng._make_plan(slack=1.3)
    good = eng._plan
    # sabotage: shrink every capacity
    eng._plan = dataclasses.replace(
        good, ghost_capacity=8, cell_capacity=8, cand_capacity=2,
        k_caps=tuple((k, 8) for k, _ in good.k_caps))
    eng.rebuild_neighbors()          # must recover via host re-sizing
    pe, _ = eng.evaluate()
    assert abs(float(pe) - -2061.6112) < 1e-3


def test_nonperiodic_dim_plan_and_energy(rebo_file):
    """Non-periodic z: make_plan must not crash (margins[2]=0 puts the
    eps-padded prism AABB at the halo boundary — the a_range clamp), and
    the device rebuild must agree with the host build."""
    state = rebomos_bulk(nx=4, ny=8, nz=2, tilt_xy=0.0)
    # re-declare z as a free boundary with vacuum so no pair crosses it
    import dataclasses as dc
    from lammps_plugins_tpu.core.box import Box
    h = state.box.h_np()
    lo = state.box.lo_np()
    h2 = h.copy()
    h2[2, 2] += 30.0                     # vacuum pad above the slab
    box = Box(h=jnp.asarray(h2, state.box.h.dtype),
              lo=jnp.asarray(lo - np.array([0, 0, 15.0]),
                             state.box.lo.dtype),
              periodic=(True, True, False),
              h64=Box._master(h2),
              lo64=Box._master(lo - np.array([0, 0, 15.0])))
    state = dc.replace(state, box=box)
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])

    eng_h = Engine(state, pair, [FixNVE()], units.METAL,
                   device_rebuild=False)
    pe_h, _ = eng_h.evaluate()

    eng_d = Engine(state, pair, [FixNVE()], units.METAL,
                   device_rebuild=True)
    pe_d, _ = eng_d.evaluate()
    assert np.isfinite(float(pe_d))
    assert abs(float(pe_d) - float(pe_h)) < 1e-9 * abs(float(pe_h))


def test_analytic_lj_forces_match_autodiff(rebo_file):
    """REBOMoS.forces computes the LJ tier in closed form over the cell
    grid; it must equal the autodiff gradient of the same weighted
    energy to rounding."""
    from lammps_plugins_tpu.potentials.base import PairStyle

    state = rebomos_bulk()
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    eng = Engine(state, pair, [FixNVE()], units.METAL, device_rebuild=True)
    eng.evaluate()
    st, nbr = eng.state, eng.nbr
    f_analytic = pair.forces(st.x, st.type, nbr, st.box.h)
    f_autodiff = PairStyle.forces(pair, st.x, st.type, nbr, st.box.h)
    np.testing.assert_allclose(np.asarray(f_analytic),
                               np.asarray(f_autodiff),
                               rtol=1e-9, atol=1e-10)


def test_fused_device_loop_matches_host_loop(rebo_file):
    """The lax.while_loop fused run path (segments + in-loop rebuilds, one
    host sync per span) must reproduce the per-segment host loop exactly:
    same rebuild decisions, same redo semantics, bitwise-same trajectory."""
    from lammps_plugins_tpu.fixes.velocity import velocity_create

    def make():
        state = rebomos_bulk()
        state = velocity_create(state, units.METAL, 600.0, seed=77)
        pair = REBOMoS.from_file(rebo_file, ["M", "S"])
        # skin small enough that 40 steps at 600 K trip rebuilds
        return Engine(state, pair, [FixNVE()], units.METAL,
                      device_rebuild=True, check_every=5, skin=0.4)

    eng_h = make()
    eng_h.fused_loop = False
    eng_h.run(40)

    eng_f = make()
    eng_f.fused_loop = True
    eng_f.run(40)

    assert int(eng_f.state.step) == int(eng_h.state.step) == 40
    # same rebuild/redo decisions and physics; the two compiled programs
    # may reassociate float ops, so "equal" means ~1 ulp here
    np.testing.assert_allclose(np.asarray(eng_f.state.x),
                               np.asarray(eng_h.state.x),
                               rtol=1e-13, atol=1e-13)
    np.testing.assert_allclose(np.asarray(eng_f.state.v),
                               np.asarray(eng_h.state.v),
                               rtol=1e-12, atol=1e-14)


def test_fused_loop_falls_back_on_dispatch_failure(rebo_file):
    """Any exception out of the fused span dispatch (e.g. a backend
    compile failure on hardware the suite can't exercise) must degrade
    to the per-segment host loop, not kill the run — the driver bench
    depends on this guarantee."""
    import warnings as _w
    from lammps_plugins_tpu.fixes.velocity import velocity_create

    def make():
        state = rebomos_bulk()
        state = velocity_create(state, units.METAL, 600.0, seed=77)
        pair = REBOMoS.from_file(rebo_file, ["M", "S"])
        return Engine(state, pair, [FixNVE()], units.METAL,
                      device_rebuild=True, check_every=5, skin=0.4)

    eng_h = make()
    eng_h.fused_loop = False
    eng_h.run(20)

    eng_f = make()
    eng_f.fused_loop = True

    def boom(m, _retry=0):
        raise RuntimeError("synthetic dispatch failure")

    eng_f._run_span_device = boom
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        eng_f.run(20)
    assert any("falling back" in str(w.message) for w in rec)
    assert eng_f.fused_loop is False
    assert int(eng_f.state.step) == 20
    np.testing.assert_allclose(np.asarray(eng_f.state.x),
                               np.asarray(eng_h.state.x),
                               rtol=1e-13, atol=1e-13)


def test_fused_loop_inloop_overflow_recovery(rebo_file):
    """An overflow inside the fused loop's in-loop rebuild must discard
    the whole span, re-size, and re-run it — ending on the same
    trajectory as the host loop."""
    from lammps_plugins_tpu.fixes.velocity import velocity_create

    def make():
        state = rebomos_bulk()
        state = velocity_create(state, units.METAL, 600.0, seed=31)
        pair = REBOMoS.from_file(rebo_file, ["M", "S"])
        return Engine(state, pair, [FixNVE()], units.METAL,
                      device_rebuild=True, check_every=5, skin=0.4)

    eng_h = make()
    eng_h.fused_loop = False
    eng_h.run(30)

    eng_f = make()
    eng_f.fused_loop = True
    eng_f.rebuild_neighbors()
    # sabotage the candidate-grid capacity (internal rebuild scratch —
    # same output shapes, so the carried lists stay compatible) so the
    # FIRST in-loop rebuild overflows and the span must be discarded
    good = eng_f._plan
    eng_f._plan = dataclasses.replace(good, cand_capacity=2)
    eng_f._loop_jit = None
    eng_f.run(30)
    assert eng_f._plan.cand_capacity > 2, "no overflow re-size happened"

    assert int(eng_f.state.step) == 30
    np.testing.assert_allclose(np.asarray(eng_f.state.x),
                               np.asarray(eng_h.state.x),
                               rtol=1e-13, atol=1e-13)


def test_k_overflow_recovery_widens_headroom(rebo_file):
    """A K-cap overflow recovery must converge and permanently widen the
    tighten headroom, so the re-tighten policy cannot pull the cap back
    into the overflow zone (the 863 K AEAM tug-of-war: recovery grew the
    cap, the instantaneous-kmax tighten shrank it to kmax+2, the next
    span re-overflowed — RuntimeError after 6 retries, host fallback)."""
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.run.simulation import _quantize_k

    def make():
        state = rebomos_bulk()
        state = velocity_create(state, units.METAL, 600.0, seed=7)
        pair = REBOMoS.from_file(rebo_file, ["M", "S"])
        return Engine(state, pair, [FixNVE()], units.METAL,
                      device_rebuild=True, check_every=5, skin=0.4)

    eng_h = make()
    eng_h.fused_loop = False
    eng_h.run(20)

    eng_f = make()
    eng_f.fused_loop = True
    eng_f.rebuild_neighbors()
    good = eng_f._plan
    kmax = int(np.max(np.sum(np.asarray(eng_f.nbr.lists["rebo"].mask), 1)))
    # sabotage the rebo K cap below the true kmax and rebuild: the
    # overflow-recovery path must converge (and widen the headroom)
    bad_caps = tuple((n, 8 if n == "rebo" else k) for n, k in good.k_caps)
    eng_f._plan = dataclasses.replace(good, k_caps=bad_caps)
    eng_f._loop_jit = None
    eng_f.rebuild_neighbors()

    assert dict(eng_f._plan.k_caps)["rebo"] >= kmax
    assert eng_f._k_headroom == 10          # recovery widened it

    # spans after recovery run fine and never re-tighten into overflow
    eng_f.run(20)
    assert int(eng_f.state.step) == 20
    assert dict(eng_f._plan.k_caps)["rebo"] >= _quantize_k(kmax)
    np.testing.assert_allclose(np.asarray(eng_f.state.x),
                               np.asarray(eng_h.state.x),
                               rtol=1e-13, atol=1e-13)


def test_two_stage_ghost_compaction_matches_host(rebo_file):
    """A box large enough that the boundary-atom prefilter engages
    (bnd_capacity < n) must produce exactly the same ghost set as the
    single-stage compaction (same margin criterion, different pipeline) —
    the two-stage form is the rebuild's round-4 hot-path change and
    small test boxes fall back to the single-stage form."""
    state = rebomos_bulk(nx=24, ny=24, nz=8, tilt_xy=0.0)
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])

    eng = Engine(state, pair, [FixNVE()], units.METAL,
                 device_rebuild=True)
    eng.rebuild_neighbors()
    plan2 = eng._plan
    assert 0 < plan2.bnd_capacity < state.natoms, \
        "two-stage path not engaged; enlarge the scene"

    def ghost_set(plan):
        from lammps_plugins_tpu.neighbor import device_build
        h, h_inv, lo = eng._box_dev
        _, _, nbr, flags = device_build.device_rebuild(
            plan, eng.state.x, eng.state.image, eng.state.type,
            h, h_inv, lo, eng._cut_mats_dev)
        assert not any(bool(v) for k, v in jax.device_get(flags).items()
                       if "overflow" in k)
        ow = np.asarray(nbr.ghosts.owner)
        sh = np.asarray(nbr.ghosts.shift)
        ok = np.abs(sh).max(axis=1) < 2     # parked rows carry 1e5
        return {(int(o), int(a), int(b), int(c))
                for o, (a, b, c) in zip(ow[ok], sh[ok].astype(int))}

    plan1 = dataclasses.replace(plan2, bnd_capacity=0)
    s2 = ghost_set(plan2)
    s1 = ghost_set(plan1)
    assert s1 == s2 and len(s1) > 1000
