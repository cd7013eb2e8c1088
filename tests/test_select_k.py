"""select_k Pallas kernel (interpret mode) vs lax.top_k reference.

CPU CI normally takes the lax.top_k fallback inside the device rebuild, so
the kernel that builds every TPU neighbor list would otherwise have zero
test coverage.  These tests run it in Pallas interpret mode.
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_plugins_tpu.ops.select_k_pallas import select_k


def _topk_reference(keys, k):
    """Positions of the k smallest per row, ascending; W for exhausted."""
    N, W = keys.shape
    neg_vals, pos = jax.lax.top_k(-keys, k)
    pos = np.asarray(pos)
    valid = np.asarray(neg_vals) > -np.inf
    return np.where(valid, pos, W), valid


@pytest.mark.parametrize("seed,ties", [(0, False), (1, True), (2, True)])
def test_select_k_matches_topk(seed, ties):
    rng = np.random.default_rng(seed)
    N, W, K = 40, 256, 16
    keys = rng.uniform(0.0, 10.0, (N, W)).astype(np.float32)
    if ties:
        # quantize to force many exact ties
        keys = np.round(keys * 2.0) / 2.0
    # random invalid (inf) padding, including some fully-exhausted rows
    mask = rng.uniform(size=(N, W)) < 0.6
    mask[0] = False                     # row with zero valid slots
    mask[1, :5] = True                  # row with fewer than K valid slots
    mask[1, 5:] = False
    keys = np.where(mask, keys, np.inf).astype(np.float32)

    pos = np.asarray(select_k(jnp.asarray(keys), K, interpret=True))
    ref_pos, ref_valid = _topk_reference(jnp.asarray(keys), K)

    # selected KEY VALUES must match the reference exactly (positions can
    # differ on ties; both must pick keys in ascending sorted order)
    got_valid = pos < W
    np.testing.assert_array_equal(got_valid, ref_valid)
    padded = np.pad(keys, ((0, 0), (0, 1)), constant_values=np.inf)
    got_vals = np.take_along_axis(padded, pos, axis=1)
    ref_vals = np.take_along_axis(padded, ref_pos, axis=1)
    np.testing.assert_array_equal(got_vals[got_valid], ref_vals[ref_valid])
    # tie-break contract: lowest column first, so positions are unique
    for r in range(N):
        vp = pos[r][got_valid[r]]
        assert len(set(vp.tolist())) == len(vp)


def test_select_k_payloads():
    rng = np.random.default_rng(7)
    N, W, K = 24, 128, 8
    keys = rng.uniform(0.0, 5.0, (N, W)).astype(np.float32)
    keys[keys > 4.0] = np.inf
    ids = rng.integers(0, 2 ** 20, (N, W)).astype(np.float32)
    types = rng.integers(1, 3, (N, W)).astype(np.float32)

    pos, sel_ids, sel_types = select_k(
        jnp.asarray(keys), K, interpret=True,
        payloads=(jnp.asarray(ids), jnp.asarray(types)))
    pos, sel_ids, sel_types = map(np.asarray, (pos, sel_ids, sel_types))
    valid = pos < W
    np.testing.assert_array_equal(
        sel_ids[valid],
        np.take_along_axis(ids, np.minimum(pos, W - 1), axis=1)[valid])
    np.testing.assert_array_equal(
        sel_types[valid],
        np.take_along_axis(types, np.minimum(pos, W - 1), axis=1)[valid])


def test_device_rebuild_with_pallas_select_k(rebo_file, monkeypatch):
    """One full device rebuild with the Pallas select-k path (interpret)."""
    from lammps_plugins_tpu.api.scenes import rebomos_bulk
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    state = rebomos_bulk()
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])

    eng_ref = Engine(state, pair, [FixNVE()], units.METAL,
                     device_rebuild=True)
    pe_ref, _ = eng_ref.evaluate()

    monkeypatch.setenv("LPT_SELECT_PALLAS", "interpret")
    eng = Engine(state, pair, [FixNVE()], units.METAL, device_rebuild=True)
    pe, _ = eng.evaluate()
    assert abs(float(pe) - float(pe_ref)) < 1e-9 * abs(float(pe_ref))
    np.testing.assert_allclose(np.asarray(eng.state.f),
                               np.asarray(eng_ref.state.f),
                               rtol=1e-10, atol=1e-11)
