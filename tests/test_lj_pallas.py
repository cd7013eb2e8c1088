"""Pallas cell-pair LJ kernel vs the XLA cell-form reference (interpret mode).

The kernel (ops/lj_cells_pallas.py) must reproduce the switched-LJ forces
and energy of the existing XLA half-offset cell sweep — same physics
(pair_rebomos.cpp:518-543), different enumeration (27-offset A-side) and
arithmetic (MXU rsq via the augmented-coordinate matmul)."""

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
def cells_setup():
    state = rebomos_bulk_commensurate(nx=3, ny=4, nz=1, dtype=jnp.float32)
    # jiggle positions so forces are nonzero and regimes are exercised
    rng = np.random.default_rng(4)
    x = np.asarray(state.x) + rng.uniform(-0.12, 0.12, state.x.shape)
    state = state.replace(x=jnp.asarray(x, jnp.float32))
    pair = REBOMoS.from_file(REBO_FILE, ["M", "S"], dtype=jnp.float32)
    eng = Engine(state, pair, [FixNVE()], units.METAL, device_rebuild=True)
    eng.rebuild_neighbors()
    return eng


def test_a_range_covers_all_owned(cells_setup):
    eng = cells_setup
    cells = eng.nbr.cells
    n = eng.state.natoms
    Dx, Dy, Dz = cells.dims
    C = cells.table.shape[1]
    (x0, x1), (y0, y1), (z0, z1) = cells.a_range
    ids = np.asarray(cells.table[:Dx * Dy * Dz]).reshape(Dx, Dy, Dz, C)
    inside = ids[x0:x1, y0:y1, z0:z1].reshape(-1)
    owned_inside = np.sort(inside[inside < n])
    assert owned_inside.shape[0] == n
    np.testing.assert_array_equal(owned_inside, np.arange(n))


def test_halo_ring_is_empty(cells_setup):
    cells = cells_setup.nbr.cells
    Dx, Dy, Dz = cells.dims
    C = cells.table.shape[1]
    m_pad = int(np.asarray(cells.table).max())     # pad id == m_all
    t5 = np.asarray(cells.table[:Dx * Dy * Dz]).reshape(Dx, Dy, Dz, C)
    for sl in (t5[0], t5[-1], t5[:, 0], t5[:, -1], t5[:, :, 0],
               t5[:, :, -1]):
        assert (sl == m_pad).all()


def test_forces_match_xla_cells(cells_setup):
    eng = cells_setup
    pair, st, nbr = eng.pair, eng.state, eng.nbr
    h = st.box.h
    f_ref = jax.jit(lambda x: -jax.grad(
        lambda x_: pair._lj_energy_cells(x_, None, nbr.ghosts, nbr.cells,
                                         h))(x))(st.x)
    f_pal = pair._lj_forces_pallas(st.x, nbr.ghosts, nbr.cells, h,
                                   interpret=True)
    f_ref = np.asarray(f_ref)
    f_pal = np.asarray(f_pal)
    scale = np.abs(f_ref).max()
    assert scale > 1e-4                      # forces are non-trivial
    np.testing.assert_allclose(f_pal, f_ref, atol=2e-4 * scale, rtol=2e-4)


def test_energy_matches_xla_cells(cells_setup):
    eng = cells_setup
    pair, st, nbr = eng.pair, eng.state, eng.nbr
    h = st.box.h
    e_ref = float(pair._lj_energy_cells(st.x, None, nbr.ghosts, nbr.cells,
                                        h))
    e_pal = float(pair._lj_energy_pallas(st.x, nbr.ghosts, nbr.cells, h,
                                         interpret=True))
    assert abs(e_pal - e_ref) < 2e-5 * abs(e_ref)


def test_rebo_cotangents_match_autodiff(cells_setup):
    """Hand-derived REBO force kernel vs the autodiff vjp path (f32)."""
    eng = cells_setup
    pair, st, nbr = eng.pair, eng.state, eng.nbr
    h = st.box.h
    ghosts, rebo = nbr.ghosts, nbr.lists["rebo"]
    el_own = pair.typemap[st.type]
    el_all = pair.typemap[ghosts.all_types(st.type)]

    f_ad = pair._rebo_forces_mirror(st.x, el_own, el_all, ghosts, rebo, h,
                                    force_pallas=False)
    f_pl = pair._rebo_forces_mirror(st.x, el_own, el_all, ghosts, rebo, h,
                                    force_pallas=True, interpret=True)
    f_ad = np.asarray(f_ad)
    f_pl = np.asarray(f_pl)
    scale = np.abs(f_ad).max()
    assert scale > 1e-3
    np.testing.assert_allclose(f_pl, f_ad, atol=5e-4 * scale, rtol=5e-4)


def test_half_kernel_matches_full(cells_setup):
    """Newton-half kernel set vs the full 27-offset kernel (interpret)."""
    from lammps_plugins_tpu.ops import lj_cells_pallas as ljp
    eng = cells_setup
    pair, st, nbr = eng.pair, eng.state, eng.nbr
    cells = nbr.cells
    P, table = pair._cell_planes(st.x, nbr.ghosts, cells, st.box.h)
    F = ljp.lj_cell_forces(P, pair._lj_consts, cells.a_range,
                           cells.cell_mn, cells.cell_size, interpret=True)
    F3_full = np.asarray(F[..., 0:3, :].transpose(0, 1, 2, 4, 3))
    F3_half = np.asarray(ljp.lj_cell_forces_half(
        P, pair._lj_consts, cells.a_range, interpret=True))
    scale = np.abs(F3_full).max()
    assert scale > 1e-4
    np.testing.assert_allclose(F3_half, F3_full, atol=3e-4 * scale,
                               rtol=3e-4)


def test_mirror_rows_path_matches(cells_setup, monkeypatch):
    """LPT_MIR_ROWS (kernel-emitted [K,Np,4] cotangent rows) vs default."""
    eng = cells_setup
    pair, st, nbr = eng.pair, eng.state, eng.nbr
    h = st.box.h
    ghosts, rebo = nbr.ghosts, nbr.lists["rebo"]
    el_own = pair.typemap[st.type]
    el_all = pair.typemap[ghosts.all_types(st.type)]
    f_def = np.asarray(pair._rebo_forces_mirror_tn(
        st.x, el_own, el_all, ghosts, rebo, h, interpret=True))
    monkeypatch.setenv("LPT_MIR_ROWS", "1")
    f_rows = np.asarray(pair._rebo_forces_mirror_tn(
        st.x, el_own, el_all, ghosts, rebo, h, interpret=True))
    np.testing.assert_allclose(f_rows, f_def, atol=1e-6, rtol=1e-6)
