"""On-device (jitted) neighbor rebuild — fixed-shape cell binning on TPU.

The host numpy build (build.py) is exact but serial; at 100k+ atoms a
rebuild costs tens of seconds on this class of host, which would dominate
the step budget.  This module is the TPU-native rebuild from SURVEY.md
section 7.1: everything — wrapping, ghost-image compaction, cell binning,
candidate generation, per-tier top-k compaction — is one jitted function of
fixed shapes, so a rebuild costs device milliseconds and no host<->device
traffic beyond tiny overflow flags.

Two grids, two products:

  * A FINE grid sized by the largest [N, K]-tier cutoff (+skin) generates
    per-atom neighbor candidates: 27 fine cells around each atom.  For
    REBOMOS the [N, K] tier is the 3.8 A REBO shell, so the candidate row
    is 27 * Cf ~ 500 wide instead of the 3456 a single interaction-range
    grid needs — gathers and top_k shrink ~8x.  All bulk data moves by
    ROW gathers of whole cell rows (TPU gather cost is per index, ~15 ns;
    a [n, 27] row gather of Cf-wide rows costs ~40 ms where the naive
    [n, 27*Cf] element gather costs seconds).
  * A COARSE grid sized by the largest cell-form tier cutoff (+skin)
    produces the dense cell table + half-offset neighbor map consumed by
    gather-free cell-pair evaluation (potentials/rebomos.py).

Shapes are fixed by a host-side `RebuildPlan` (capacities with slack);
capacity overflow sets flags that the Engine checks, re-sizing and
retrying (the recoverable analogue of LAMMPS's fatal neighbor-page
overflow, pair_rebomos.cpp:349-350).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import Box
from .neighbor import Ghosts, NeighborList
from .build import NeighborData

BIG = jnp.inf


def _select_k_mode():
    """Pallas select-k on accelerators; XLA top_k on CPU (interpret mode is
    available for tests via LPT_SELECT_PALLAS=interpret)."""
    import os
    flag = os.environ.get("LPT_SELECT_PALLAS")
    if flag == "interpret":
        return "interpret"
    if flag is not None:
        return flag not in ("0", "off")
    return jax.default_backend() not in ("cpu",)


def _matvec3(v, m):
    """Row-vector [.,3] x [3,3] written component-wise.

    NEVER use `@` for coordinate transforms on the device: TPU routes f32
    matmuls through the MXU at bfloat16 precision by default, which is a
    ~1e-2 relative error — enough to corrupt wrapped positions and ghost
    images by tenths of an Angstrom (observed: impossible 2.02 A bonds and
    a 0.6 eV/atom energy error at 99k atoms, TPU-only)."""
    return jnp.stack(
        [v[:, 0] * m[0, a] + v[:, 1] * m[1, a] + v[:, 2] * m[2, a]
         for a in range(3)], axis=1)


@dataclasses.dataclass(frozen=True)
class RebuildPlan:
    """Static geometry + capacities for the jitted rebuild (hashable)."""

    shifts: Tuple[Tuple[int, int, int], ...]   # candidate image shifts
    margins: Tuple[float, float, float]        # fractional ghost margins
    grid_mn: Tuple[float, float, float]        # Cartesian grid origin
    ghost_capacity: int
    # fine / candidate grid (feeds the [N, K] tiers)
    cand_dims: Tuple[int, int, int]
    cand_size: float
    cand_capacity: int                         # Cf: fine-cell slots
    k_caps: Tuple[Tuple[str, int], ...]        # per-tier K ([N,K] tiers)
    # coarse / cell grid (feeds cell-form tiers).  The grid carries a
    # one-cell halo ring of always-empty cells (cell_mn = grid_mn shifted by
    # -cell_size, dims grown by 2) so the Pallas cell-pair kernel can index
    # every neighbor cell affinely with no boundary logic.
    cell_dims: Tuple[int, int, int]
    cell_size: float
    cell_capacity: int                         # C: coarse-cell slots
    cell_tiers: Tuple[str, ...]
    list_cut: float                            # ghost halo width (inc. skin)
    skin: float
    mirror_tiers: Tuple[str, ...] = ()         # tiers with mirror tables
    cell_mn: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # static (start, stop) cell-index box covering every cell that can hold
    # an OWNED atom (cells intersecting the primary prism's AABB + eps);
    # the kernel runs A-centers over exactly this range
    a_range: Tuple[Tuple[int, int], ...] = ((0, 0), (0, 0), (0, 0))
    # per-dim periodicity: the rebuild wraps positions only on periodic
    # dims (the sharded slab boxes are non-periodic along the slab axis)
    periodic: Tuple[bool, bool, bool] = (True, True, True)
    # box origin the grid origins were derived from.  device_rebuild bins
    # with mn = grid_mn + (lo - lo_ref): the sharded engine reuses ONE
    # plan for every slab, each at its own lo.  (Binning with the
    # absolute grid_mn clipped shards d>0 into the last x-layer of
    # cells — physics survived, because the clipped pile stays within the
    # 27-cell shell and the rsq filter recovers true neighbors, but cell
    # occupancy exploded ~30x and with it rebuild + LJ-kernel cost.)
    lo_ref: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # Windowed mirror-combine geometry: W = mirror_window (columns per
    # cyclic window, 0 = disabled), B = mirror_chunk (output columns per
    # chunk).  The step-time mirror gather cliffs ~2x on operand physical
    # size (probe_mirror17: tables <= ~190k rows of 512 B-tiled width-3
    # rows ride a fast class); chunking the gather over per-chunk cyclic
    # windows of the cotangent table keeps each operand under the cliff
    # when the atom ordering is spatially local (scene generators emit
    # cell-sorted atoms; the needed width is measured every rebuild as
    # count:mirwin and overflow-flagged).
    mirror_window: int = 0
    mirror_chunk: int = 2048
    # Block-sparse reaction-combine capacities (ops/react_pallas.py):
    # NW = marked 128-column source blocks per 128-atom target chunk,
    # KC = route depth (max edges from one source column into one target
    # chunk).  0 disables (the step falls back to the XLA mirror gather);
    # the rebuild measures the exact needed values every build
    # (count:rnw/count:rkc) so the engine can ratchet them like kmax.
    react_nw: int = 0
    react_kc: int = 0
    react_qr: int = 0          # packed scratch-row capacity (route loop)
    # boundary-atom capacity for the two-stage ghost compaction (0 =
    # single-stage); measured each rebuild as count:bnd and ratcheted
    bnd_capacity: int = 0
    # Fractional (lattice-coordinate) coarse cells: the interior grid
    # tiles the primary prism EXACTLY with cell_dims-2 sheared cells per
    # dim (each of perpendicular width >= list_cut), so cell occupancy is
    # uniform at the mean density.  The Cartesian AABB grid of a
    # triclinic box (gamma=113.4 deg on the REBOMOS bench) oversizes the
    # A-range ~1.5x and spreads occupancy 74 mean / 112 cap; since the
    # Pallas cell-pair kernel's work is A_cells * 27 * C^2, fractional
    # binning cut its pair evaluations 6.2e8 -> 3.5e8 per step at 98k
    # atoms.  Binning uses the wrapped fractional coords the rebuild
    # already computes; the kernel itself is unchanged (it reads packed
    # Cartesian coordinates from the cell planes).
    cell_frac: bool = False


def choose_mirror_window(n: int, w_needed: int,
                         chunk: int = 2048) -> Tuple[int, int]:
    """(mirror_window, mirror_chunk) policy from a measured needed width.

    Windows only pay above the gather-class cliff (small tables already
    ride the fast class) and only when the window is meaningfully
    smaller than the full table.  Returns (0, chunk) to disable.
    """
    import os
    flag = os.environ.get("LPT_MIRWIN")
    # MEASURED DEAD END in-step, default OFF: standalone the chunked
    # windowed gather beats the single 2M-index gather 1.8x
    # (probe_mirror18: 6.9 vs 12.7 ms), but inside the fused step loop
    # the ~4 ops/chunk x 48 chunks of slices/stacks/gathers pay per-op
    # overheads that swamp the gather win (bench: 8.9e5 vs 3.19e6
    # atom-steps/s at 98k atoms).  Kept flag-gated (LPT_MIRWIN=1|force)
    # with CPU interpret-mode parity coverage, same standard as the
    # other recorded mirror probes.
    if flag not in ("1", "force"):
        return 0, chunk
    np_pad = -(-n // 128) * 128
    if w_needed <= 0:
        return 0, chunk
    W = max(chunk * 2, -(-int(w_needed) // 512) * 512 + 512)
    if flag == "force":
        return min(W, np_pad), chunk
    if n < 32768 or W > np_pad // 2:
        return 0, chunk
    return W, chunk


def choose_react(n: int, nw_needed: int, kc_needed: int,
                 rq_needed: int) -> Tuple[int, int, int]:
    """(react_nw, react_kc, react_qr) policy from measured geometry.

    Returns (0, 0, 0) to disable: small systems (the gather is cheap
    there), unsorted scenes (nw/rq explode — the kernel's route loop is
    linear in QR), or very deep routes.

    DEFAULT OFF — measured loss at 98k atoms (round 4): the stack+route
    kernels run 4.4 + 7.8 ms/step in-loop (xplane trace) vs ~11.4 ms for
    the mirror gather they replace; the one-hot routing's ~1.0G
    (entry x output-lane) compare-accumulate cells run at ~1 vreg-op/
    cycle on the v5e VPU, a ~7 ms floor that no layout variant beat
    (fori rotating-carry 46 ms from register-carry spills, 8-wide
    roll 11 ms, grid-step static slicing 7.8 ms).  Kept behind
    LPT_REACT=1|force with full parity coverage, same standard as the
    other measured mirror experiments.  LPT_REACT=force enables
    regardless of size (CPU parity tests)."""
    import os
    flag = os.environ.get("LPT_REACT", "0")
    if flag in ("0", "off"):
        return 0, 0, 0
    if nw_needed <= 0 or kc_needed <= 0 or rq_needed <= 0:
        return 0, 0, 0
    nch = -(-n // 128)
    if flag != "force" and (n < 16384 or nch > 2048):
        # nch cap: route construction currently builds a dense
        # [nch, nch] block-marking table (fine to ~2k chunks / 260k
        # atoms); banded marking lifts this for 1M+ systems
        return 0, 0, 0
    NW = -(-int(nw_needed) // 4) * 4 + 4
    KC = -(-int(kc_needed) // 2) * 2 + 2
    QR = -(-int(rq_needed) // 16) * 16 + 16
    if flag != "force" and (NW > 48 or KC > 12 or QR > 112):
        return 0, 0, 0     # degraded spatial sort: kernel would lose
    return NW, KC, QR


def make_plan(box: Box, requests: Dict[str, np.ndarray], skin: float,
              ghost_count: int, max_cell_occupancy: int,
              k_counts: Dict[str, int], slack: float = 1.3,
              cell_tiers: Tuple[str, ...] = (),
              cand_occupancy: int | None = None,
              mirror_tiers: Tuple[str, ...] = (),
              k_final: bool = False,
              frac_cells: bool = True,
              mirror_window: int = 0,
              mirror_chunk: int = 2048,
              react_nw: int = 0,
              react_kc: int = 0,
              react_qr: int = 0,
              bnd_count: int = 0) -> RebuildPlan:
    """Derive static geometry + padded capacities from measured counts.

    max_cell_occupancy is the coarse-grid occupancy; cand_occupancy the
    fine-grid one (estimated from the volume ratio when not measured).

    k_final=True takes the k_counts values as the exact K capacities
    (just rounded up to 8), bypassing the slack multiplier.  The resize
    path uses this so K is a deterministic function of the measured kmax
    — double slack (quantize-then-multiply) made K flip between 32 and
    48 on sub-count measurement jitter, a 2x step-time swing.
    """
    cuts = {k: np.asarray(v, np.float64) for k, v in requests.items()}
    list_cut = max(float(v.max()) for v in cuts.values()) + skin
    knames = [k for k in cuts if k not in cell_tiers]
    cand_size = (max(float(cuts[k].max()) for k in knames) + skin
                 if knames else list_cut)
    cell_size = (max(float(cuts[k].max()) for k in cell_tiers) + skin
                 if cell_tiers else list_cut)

    widths = box.perpendicular_widths_np()
    # ghost margin = list_cut exactly: candidates (and the cell-form
    # tier's reach) only need build-time distance <= max_cut + skin;
    # the old extra +skin inflated ghosts ~15% at 98k atoms
    gmargin = list_cut + 1e-3
    margins = tuple(float(gmargin / widths[d])
                    if box.periodic[d] else 0.0 for d in range(3))
    nrep = [int(np.ceil(gmargin / widths[d]))
            if box.periodic[d] else 0 for d in range(3)]
    shifts = tuple((sx, sy, sz)
                   for sx in range(-nrep[0], nrep[0] + 1)
                   for sy in range(-nrep[1], nrep[1] + 1)
                   for sz in range(-nrep[2], nrep[2] + 1)
                   if (sx, sy, sz) != (0, 0, 0))

    # Cartesian bounding box of the margin-expanded cell
    h = box.h_np()
    lo = box.lo_np()
    corners = []
    for a in (-margins[0], 1 + margins[0]):
        for b in (-margins[1], 1 + margins[1]):
            for c in (-margins[2], 1 + margins[2]):
                corners.append(lo + np.array([a, b, c]) @ h)
    corners = np.array(corners)
    mn = corners.min(axis=0) - 1e-6
    mx = corners.max(axis=0) + 1e-6
    cand_dims = tuple(int(np.ceil((mx[d] - mn[d]) / cand_size))
                      for d in range(3))
    # coarse grid: one-cell halo ring (empty by construction — real atoms
    # live within the margins, strictly inside)
    cell_mn = tuple(float(mn[d] - cell_size) for d in range(3))
    cell_dims = tuple(int(np.ceil((mx[d] - mn[d]) / cell_size)) + 2
                      for d in range(3))
    # A-range: cells intersecting the primary prism's AABB (owned atoms are
    # wrapped into the prism; eps covers f32 wrap rounding at the faces)
    pcorners = np.array([lo + np.array([a, b, c]) @ h
                         for a in (0.0, 1.0) for b in (0.0, 1.0)
                         for c in (0.0, 1.0)])
    eps = 1e-4 * cell_size + 1e-3
    pmn = pcorners.min(axis=0) - eps
    pmx = pcorners.max(axis=0) + eps
    a_range = []
    for d in range(3):
        a0 = int(np.floor((pmn[d] - cell_mn[d]) / cell_size))
        a1 = int(np.floor((pmx[d] - cell_mn[d]) / cell_size)) + 1
        # Non-periodic dims have margins[d]=0, so the eps-padded prism AABB
        # pokes one eps into the halo ring (a0=0 / a1=cell_dims).  Atoms at
        # the box face still bin to interior cells (cell_mn sits one full
        # cell below mn); only the eps slop crosses, so clamping is exact.
        a0 = max(a0, 1)
        a1 = min(a1, cell_dims[d] - 1)
        if not (1 <= a0 < a1 <= cell_dims[d] - 1):
            raise AssertionError(
                f"A-range dim {d}: [{a0},{a1}) outside halo-safe "
                f"[1,{cell_dims[d] - 1})")
        a_range.append((a0, a1))
    a_range = tuple(a_range)

    # fractional coarse cells (see RebuildPlan.cell_frac): viable when the
    # box is fully periodic (non-periodic dims leave fractional coords
    # unwrapped/unbounded) and at least one cell fits per dim.  m_d =
    # floor(W_d / gmargin) guarantees both the +-1-cell scan reach
    # (perpendicular width >= cell cutoff) and that one halo ring holds
    # the whole ghost margin (margin_d = gmargin/W_d <= 1/m_d).
    cell_frac = False
    if frac_cells and cell_tiers and all(box.periodic):
        m_frac = [int(np.floor(widths[d] / gmargin)) for d in range(3)]
        if all(m >= 1 for m in m_frac):
            cell_frac = True
            cell_dims = tuple(m + 2 for m in m_frac)
            a_range = tuple((1, m + 1) for m in m_frac)

    def pad8(v):
        return max(8, int(-(-int(v * slack) // 8) * 8))

    if cand_occupancy is None:
        cand_occupancy = int(max_cell_occupancy
                             * (cand_size / cell_size) ** 3) + 4

    return RebuildPlan(
        shifts=shifts, margins=margins, grid_mn=tuple(mn),
        lo_ref=tuple(float(v) for v in lo),
        ghost_capacity=pad8(max(ghost_count, 8)),
        cand_dims=cand_dims, cand_size=cand_size,
        cand_capacity=pad8(max(cand_occupancy, 2)),
        # K quantum 4, not 8: every [K, Np] per-edge gather is linear in K
        # and the angular kernel quadratic, so one sublane-tile of slack
        # (8) cost ~13% of the whole step at 98k atoms (kmax 18 -> 24 vs
        # 20); Mosaic masks the ragged final sublane tile fine
        k_caps=tuple(sorted(
            (k, max(8, -(-int(v) // 4) * 4) if k_final else pad8(v))
            for k, v in k_counts.items() if k not in cell_tiers)),
        cell_dims=cell_dims, cell_size=cell_size,
        # tight slack for the coarse cells: the Pallas LJ kernel's work
        # scales with C^2 per cell pair, so every 8 slots of padding costs
        # ~15% of the LJ kernel; overflow recovery handles misses
        cell_capacity=max(8, -(-int(max(max_cell_occupancy, 4) * 1.03 + 2)
                               // 8) * 8),
        cell_tiers=tuple(sorted(cell_tiers)),
        list_cut=list_cut, skin=skin,
        mirror_tiers=tuple(sorted(mirror_tiers)),
        cell_mn=cell_mn, a_range=a_range, cell_frac=cell_frac,
        periodic=tuple(bool(p) for p in box.periodic),
        mirror_window=int(mirror_window), mirror_chunk=int(mirror_chunk),
        react_nw=int(react_nw), react_kc=int(react_kc),
        react_qr=int(react_qr),
        bnd_capacity=pad8(bnd_count) if bnd_count > 0 else 0)


def make_plan_from_density(box: Box, requests: Dict[str, np.ndarray],
                           skin: float, natoms: int, slack: float = 1.6,
                           cell_tiers: Tuple[str, ...] = (),
                           mirror_tiers: Tuple[str, ...] = ()) -> RebuildPlan:
    """Capacity estimation from mean density — no host neighbor build.

    Sizes every capacity from rho = N/V assuming near-uniform density (true
    for condensed-phase MD); the jitted rebuild's overflow flags catch
    underestimates and trigger exact re-sizing, so this is a fast path, not
    a correctness assumption.
    """
    cuts = {k: np.asarray(v, np.float64) for k, v in requests.items()}
    list_cut = max(float(v.max()) for v in cuts.values()) + skin
    knames = [k for k in cuts if k not in cell_tiers]
    cand_size = (max(float(cuts[k].max()) for k in knames) + skin
                 if knames else list_cut)
    cell_size = (max(float(cuts[k].max()) for k in cell_tiers) + skin
                 if cell_tiers else list_cut)
    h = box.h_np()
    vol = abs(np.linalg.det(h))
    rho = natoms / vol
    widths = box.perpendicular_widths_np()
    margins = [(list_cut + 1e-3) / widths[d] if box.periodic[d] else 0.0
               for d in range(3)]

    expanded = vol * np.prod([1 + 2 * m for m in margins])
    ghost_count = int(rho * (expanded - vol)) + 64
    cell_vol = cell_size ** 3
    if cell_tiers and all(box.periodic):
        # mirror make_plan's fractional-cell decision for the estimate
        m_frac = [int(np.floor(widths[d] / (list_cut + 1e-3)))
                  for d in range(3)]
        if all(m >= 1 for m in m_frac):
            cell_vol = vol / float(np.prod(m_frac))
    occupancy = int(rho * cell_vol * 1.2) + 8
    cand_occ = int(rho * cand_size ** 3 * 1.2) + 4
    # boundary-atom estimate for the two-stage ghost compaction
    bnd_frac = 1.0 - float(np.prod([max(1.0 - 2.0 * m, 0.0)
                                    for m in margins]))
    bnd_count = int(natoms * bnd_frac * 1.3) + 64
    # per-center-type neighbor count: sum over neighbor types of the
    # composition-weighted cutoff ball (a max-cutoff ball overestimates
    # mixed-cutoff lists by ~2x, which doubles the K^2 angular memory)
    k_counts = {}
    for name, c in cuts.items():
        t = c.shape[0] - 1 if c.ndim == 2 else 0
        if c.ndim == 2 and t >= 1:
            per_type = []
            for i_t in range(1, t + 1):
                tot = 0.0
                for j_t in range(1, t + 1):
                    if c[i_t, j_t] > 0:
                        # equal-composition assumption; exact counts are
                        # re-measured by the rebuild flags anyway
                        tot += (rho / t) * 4.0 / 3.0 * np.pi \
                            * (float(c[i_t, j_t]) + skin) ** 3
                per_type.append(tot)
            k_counts[name] = int(max(per_type) * 1.1) + 8
        else:
            k_counts[name] = int(rho * 4.0 / 3.0 * np.pi
                                 * (float(np.max(c)) + skin) ** 3 * 1.1) + 8
    return make_plan(box, requests, skin, ghost_count, occupancy, k_counts,
                     slack=slack, cell_tiers=cell_tiers,
                     cand_occupancy=cand_occ, mirror_tiers=mirror_tiers,
                     bnd_count=bnd_count)


def _bin_dense(x_all, valid_row, mn, size, dims, capacity, m_all,
               interior_first: int = 0):
    """Sorted dense cell table [ncells+2, C] (junk row + oob row).

    interior_first > 0 clips the cell index of the first that many rows
    (the owned atoms) to the interior range [1, dims-2]: fractional
    binning arithmetic can round a wrapped coordinate at the hi face
    into the halo ring (observed: fw = 1-2^-24 with one cell per dim
    gives (fw+1)/1 -> exactly 2.0 in f32), which would place an owned
    atom outside the kernel's A-range and silently zero its force.

    Returns (dense, c3, occupancy_count, overflow)."""
    ncells = dims[0] * dims[1] * dims[2]
    c3 = jnp.clip(jnp.floor((x_all - mn) / size).astype(jnp.int32),
                  0, jnp.asarray(np.array(dims, np.int32) - 1))
    if interior_first:
        own = (jnp.arange(m_all) < interior_first)[:, None]
        c3i = jnp.clip(c3, 1, jnp.asarray(np.array(dims, np.int32) - 2))
        c3 = jnp.where(own, c3i, c3)
    cid = (c3[:, 0] * dims[1] + c3[:, 1]) * dims[2] + c3[:, 2]
    cid = jnp.where(valid_row, cid, ncells)      # invalid ghosts -> junk
    order = jnp.argsort(cid)
    cid_sorted = cid[order]
    starts = jnp.searchsorted(cid_sorted, jnp.arange(ncells + 1))
    slot = jnp.arange(m_all) - starts[cid_sorted]
    occ = jnp.max(jnp.where(cid_sorted < ncells, slot, 0)) + 1
    overflow = occ > capacity
    slot = jnp.minimum(slot, capacity - 1)
    dense = jnp.full((ncells + 2, capacity), m_all, jnp.int32)
    dense = dense.at[cid_sorted, slot].set(order.astype(jnp.int32),
                                           mode="drop")
    return dense, c3, occ, overflow


def _nbr_cell_ids(dims, offs):
    """[ncells, len(offs)] neighbor-cell ids (numpy; static geometry).
    Out-of-range neighbors map to the oob row (ncells + 1)."""
    ncells = dims[0] * dims[1] * dims[2]
    ids = np.arange(ncells)
    c3s = np.stack([ids // (dims[1] * dims[2]),
                    (ids // dims[2]) % dims[1],
                    ids % dims[2]], axis=1)
    nb = c3s[:, None, :] + offs[None, :, :]
    ok = np.all((nb >= 0) & (nb < np.array(dims)), axis=-1)
    nbid = (nb[..., 0] * dims[1] + nb[..., 1]) * dims[2] + nb[..., 2]
    return np.where(ok, nbid, ncells + 1).astype(np.int32)


def _inverse_shift_perm(shifts) -> np.ndarray:
    """Static [S+1] permutation: slot 0 = identity shift, slot s+1 = image
    shift shifts[s]; entry = the slot of the NEGATED shift."""
    lut = {(0, 0, 0): 0}
    for i, s in enumerate(shifts):
        lut[tuple(s)] = i + 1
    inv = np.zeros(len(shifts) + 1, np.int32)
    for i, s in enumerate(shifts):
        inv[i + 1] = lut[(-s[0], -s[1], -s[2])]
    return inv


def _mirror_table(idx, mask, owner, ghost_valid, sidx_ghost, inv_sidx, n, K):
    """[N, K] flat slot (row*K + col) of each edge's mirror edge.

    Edge (i, j): the mirror is the unique edge (owner(j), image of i under
    the NEGATED shift of j) — the newton-pair bijection, the TPU
    replacement for reverse ghost-force communication (pair_aeam.cpp:257).
    Resolved exactly via the ghost inverse table ginv[(owner, shift)] ->
    ghost id (no position matching): one [N, K, K] integer compare against
    the mirror rows' index lists."""
    Mg = owner.shape[0]
    # mirror row + inverse-shift slot packed as 2 columns so the per-edge
    # lookup is ONE row gather (1-D-source element gathers get flattened
    # to a scalar path by XLA: 50+ ms each at 3.1M edges)
    inv_of = jnp.asarray(inv_sidx)[sidx_ghost]         # [Mg]
    # 3 columns: [m, 2]-wide row gathers tile-pad 64x (measured 33 ms);
    # 3-wide rows match the T(4,128)-class layout the step path uses
    pack = jnp.stack(
        [jnp.concatenate([jnp.arange(n, dtype=jnp.int32),
                          owner.astype(jnp.int32)]),
         jnp.concatenate([jnp.zeros(n, jnp.int32), inv_of]),
         jnp.zeros(n + Mg, jnp.int32)], axis=1)
    safe = jnp.where(mask, idx, 0)
    os2 = pack[safe]                                   # [N, K, 3]
    o = os2[..., 0]                                    # mirror rows
    inv_sj = os2[..., 1]                               # inverse shift slot

    S1 = inv_sidx.shape[0]
    ar_n = jnp.arange(n, dtype=jnp.int32)
    ginv = jnp.full((n + 1, S1), -1, jnp.int32)
    ginv = ginv.at[ar_n, 0].set(ar_n)
    gown = jnp.where(ghost_valid, owner.astype(jnp.int32), n)
    ginv = ginv.at[gown, sidx_ghost].set(
        n + jnp.arange(Mg, dtype=jnp.int32), mode="drop")
    # per-edge tgt = ginv[i, inv_sj]: small-S1 one-hot select chain over
    # the identity rows (no batched gather)
    tgt = jnp.full((n, K), -1, jnp.int32)
    for s in range(S1):
        tgt = jnp.where(inv_sj == s, ginv[:n, s][:, None], tgt)
    if n * K * K <= 3 * 10 ** 8:
        idxro = idx[o]                                 # [N, K, K] row gather
        eq = (idxro == tgt[:, :, None]) & (tgt[:, :, None] >= 0)
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
        colp = jnp.min(jnp.where(eq, iota_k, K), axis=2)
    else:
        # large systems: the [N, K, K] compare would need N*K*K*4 bytes
        # (22 GB at 783k atoms, K=56) — scan one edge slot at a time
        iota1k = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

        def one_col(_, xs):
            o_k, tgt_k = xs                            # [N], [N]
            rows = idx[o_k]                            # [N, K] row gather
            eqk = (rows == tgt_k[:, None]) & (tgt_k[:, None] >= 0)
            return None, jnp.min(jnp.where(eqk, iota1k, K), axis=1)

        _, cols = jax.lax.scan(one_col, None,
                               (jnp.swapaxes(o, 0, 1),
                                jnp.swapaxes(tgt, 0, 1)))
        colp = jnp.swapaxes(cols, 0, 1)
    found = colp < K
    return jnp.where(mask & found, o * K + colp, -1).astype(jnp.int32)


@partial(jax.jit, static_argnums=(0,))
def device_rebuild(plan: RebuildPlan, x, image, types, h, h_inv, lo,
                   cut_mats: Dict[str, jnp.ndarray], valid=None):
    """Jitted rebuild: (x, image) -> (xw, image', NeighborData, flags).

    cut_mats: per-tier [T+1, T+1] cutoff matrices (device arrays).
    valid: optional [N] bool — rows marked False (pad slots of sharded
    slab arrays) are excluded from ghosts, cell tables and candidate
    grids, and produce empty neighbor lists.  Invalid rows should be
    parked far outside the box along a non-periodic dim.
    """
    dtype = x.dtype
    n = x.shape[0]

    # -- wrap into the primary cell (Domain::pbc) --------------------------
    f = _matvec3(x - lo, h_inv)
    shift = jnp.floor(f)
    if not all(plan.periodic):
        per = jnp.asarray(np.array(plan.periodic, np.float32), dtype)
        shift = shift * per[None, :]
    fw = f - shift
    xw = _matvec3(fw, h) + lo
    image = image + shift.astype(jnp.int32)

    # -- ghost-image compaction --------------------------------------------
    # Two-stage: only atoms within a periodic margin of some face can be
    # any image's owner, so compact the [N] boundary set first, then run
    # the [S, Nb] image test over it.  The direct [S*N] nonzero's
    # cumsum/scatter ran at ~9 ns/elem (22 ms/rebuild at 98k atoms,
    # profiled) and scales with S*N at 1M+ atoms; the boundary set is
    # ~20% of N, so the big compaction shrinks ~5x.
    shifts = jnp.asarray(np.array(plan.shifts), dtype)          # [S,3]
    margins = jnp.asarray(np.array(plan.margins), dtype)
    Mg = plan.ghost_capacity
    Nb = plan.bnd_capacity
    near = (fw <= margins) | (fw >= 1.0 - margins)
    per = jnp.asarray(np.array([m > 0 for m in plan.margins]))
    bnd = jnp.any(near & per[None, :], axis=1)
    if valid is not None:
        bnd = bnd & valid
    flags_bnd = {"count:bnd": jnp.sum(bnd)}
    if 0 < Nb < n:
        (bsel,) = jnp.nonzero(bnd, size=Nb, fill_value=-1)
        flags_bnd["bnd_overflow"] = jnp.sum(bnd) > Nb
        b_safe = jnp.maximum(bsel, 0)
        fwb = fw[b_safe]                                        # [Nb,3]
        fi = fwb[None, :, :] + shifts[:, None, :]               # [S,Nb,3]
        keep = jnp.all((fi >= -margins) & (fi <= 1.0 + margins), axis=-1)
        keep = keep & (bsel >= 0)[None, :]
        flat = keep.reshape(-1)
        (selb,) = jnp.nonzero(flat, size=Mg, fill_value=-1)
        ghost_valid = selb >= 0
        sb_safe = jnp.maximum(selb, 0)
        owner = b_safe[sb_safe % Nb].astype(jnp.int32)
        gshift = shifts[sb_safe // Nb]
        # shift-slot index for the mirror table (slot 0 = identity)
        sidx_from_sel = (sb_safe // Nb).astype(jnp.int32) + 1
    else:
        fi = fw[None, :, :] + shifts[:, None, :]                # [S,N,3]
        keep = jnp.all((fi >= -margins) & (fi <= 1.0 + margins), axis=-1)
        if valid is not None:
            keep = keep & valid[None, :]
        flat = keep.reshape(-1)
        (sel,) = jnp.nonzero(flat, size=Mg, fill_value=-1)
        ghost_valid = sel >= 0
        sel_safe = jnp.maximum(sel, 0)
        owner = (sel_safe % n).astype(jnp.int32)
        gshift = shifts[sel_safe // n]
        sidx_from_sel = (sel_safe // n).astype(jnp.int32) + 1
    # park invalid ghosts far away via an absurd shift
    gshift = jnp.where(ghost_valid[:, None], gshift, 1e5)
    ghost_overflow = jnp.sum(flat) > Mg

    ghosts = Ghosts(owner=owner, shift=gshift)
    x_all = ghosts.all_positions(xw, h)                         # [n+Mg,3]
    t_all = ghosts.all_types(types)
    m_all = n + Mg
    owned_valid = jnp.ones(n, bool) if valid is None else valid
    valid_row = jnp.concatenate([owned_valid, ghost_valid])
    lo_off = lo - jnp.asarray(np.array(plan.lo_ref), dtype)
    mn = jnp.asarray(np.array(plan.grid_mn), dtype) + lo_off
    x_pad = jnp.concatenate([x_all, jnp.full((1, 3), 1e7, dtype)], axis=0)
    t_pad = jnp.concatenate([t_all, jnp.zeros(1, t_all.dtype)])

    flags = {"ghost_overflow": ghost_overflow,
             "count:ghost": jnp.sum(flat), **flags_bnd}
    lists = {}

    # -- [N, K] tiers: fine-grid candidates, all data moved by ROW gathers --
    if plan.k_caps:
        Cf = plan.cand_capacity
        dense_f, c3f, occf, ovf = _bin_dense(
            x_all, valid_row, mn, plan.cand_size, plan.cand_dims, Cf, m_all)
        flags["candcell_overflow"] = ovf
        flags["count:candcell"] = occf
        fdims = plan.cand_dims
        ncf = fdims[0] * fdims[1] * fdims[2]

        # per-owned-atom 27-cell neighborhood (fine)
        offs27 = np.array([(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1)
                           for c in (-1, 0, 1)], np.int32)
        ci = c3f[:n]
        nbr3 = ci[:, None, :] + jnp.asarray(offs27)[None, :, :]
        in_rng = jnp.all(
            (nbr3 >= 0) & (nbr3 < jnp.asarray(np.array(fdims, np.int32))),
            axis=-1)
        ncid = (nbr3[..., 0] * fdims[1] + nbr3[..., 1]) * fdims[2] \
            + nbr3[..., 2]
        ncid = jnp.where(in_rng, ncid, ncf + 1)      # oob row
        W = 27 * Cf
        # two-step candidate assembly: small per-cell planes then [n, 27]
        # row gathers of Cf-wide rows.  Direct by-atom-id element gathers
        # of the [n, W] candidates get flattened to a ~17 ns/elem scalar
        # path by XLA (~2.7 s); a packed [.., 5]-column row gather
        # tile-pads 8.5x and OOMs HBM.  The per-cell planes themselves
        # come from ONE [m, 4] row gather (x, y, z, type packed): the
        # previous per-component x_pad[:, a][dense_f] forms were 1-D-
        # source element gathers — the slow scalar-path class, profiled
        # 11.5 ms EACH per rebuild at 98k atoms (plus 8.6 ms for the
        # type gather); the row form + component extraction is ~3 ms
        # total.
        xt_pad = jnp.concatenate(
            [x_pad, t_pad.astype(dtype)[:, None]], axis=1)   # [m+1, 4]
        tmp4 = xt_pad[dense_f]                       # [ncf+2, Cf, 4]
        tf = tmp4[..., 3].astype(jnp.int32)          # [ncf+2, Cf]
        planes = [tmp4[..., a] for a in range(3)]
        # packed candidate table [ncf+2, 5*Cf]: (x | y | z | type | id)
        # blocks, so the per-chunk candidate assembly is ONE row gather
        # (cost is per-index; row width is nearly free) instead of five —
        # profiled ~19 ms of gathers + ~11 ms of per-array reshapes per
        # rebuild at 98k atoms for the five-array form.  Ids ride as f32
        # (exact below 2^24, same bound as the select_k payloads);
        # larger row spaces keep the five-array form.
        use_packed = m_all < 2 ** 24 and os.environ.get(
            "LPT_PACKCAND", "1") not in ("0", "off")
        if use_packed:
            idf = jnp.where(dense_f < m_all, dense_f, m_all).astype(dtype)
            packed5 = jnp.concatenate(
                [tmp4[..., 0], tmp4[..., 1], tmp4[..., 2],
                 tmp4[..., 3], idf], axis=1)         # [ncf+2, 5*Cf]

        # ghost shift slots for the mirror-edge table (slot 0 = identity)
        sidx_ghost = jnp.where(ghost_valid, sidx_from_sel, 0)
        inv_sidx = _inverse_shift_perm(plan.shifts)
        use_select_k = _select_k_mode()
        # atom ids ride through select_k as f32 payloads — exact only for
        # ids < 2^24 (~16.7M).  Beyond that they would round silently and
        # corrupt neighbor lists, so fall back to the top_k path.
        if use_select_k and m_all >= 2 ** 24:
            use_select_k = False

        # chunk the candidate pipeline over atom blocks: the [chunk, W]
        # working set is ~6 arrays wide, which at 1M atoms and W=648 would
        # otherwise peak over HBM capacity
        CH = n if n <= 131072 else 65536
        nch = -(-n // CH)
        npr = nch * CH

        def padr(a, fill):
            pad = [(0, npr - n)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, pad, constant_values=fill)

        xs = (padr(ncid, ncf + 1).reshape(nch, CH, 27),
              padr(xw, 1e7).reshape(nch, CH, 3),
              padr(types, 0).reshape(nch, CH),
              padr(jnp.arange(n, dtype=jnp.int32), m_all).reshape(nch, CH))

        def chunk_body(args):
            ncid_c, xw_c, t_c, rid_c = args
            if use_packed:
                # ONE row gather of the packed (x|y|z|t|id) rows, then
                # per-component slice+reshape extraction; ids and types
                # stay f32 all the way into select_k's payload slots
                g = packed5[ncid_c]                  # [CH, 27, 5*Cf]
                comp = [g[:, :, a * Cf:(a + 1) * Cf].reshape(CH, W)
                        for a in range(5)]
                cand, cand_t = comp[4], comp[3]
                rsq = jnp.zeros((CH, W), dtype)
                for a in range(3):
                    da = comp[a] - xw_c[:, a][:, None]
                    rsq = rsq + da * da
                valid = (cand < m_all) \
                    & (cand != rid_c[:, None].astype(dtype))
            else:
                cand = dense_f[ncid_c].reshape(CH, W)
                cand_t = tf[ncid_c].reshape(CH, W)
                rsq = jnp.zeros((CH, W), dtype)
                for a in range(3):
                    da = planes[a][ncid_c].reshape(CH, W) \
                        - xw_c[:, a][:, None]
                    rsq = rsq + da * da
                valid = (cand < m_all) & (cand != rid_c[:, None])
            ti = t_c[:, None]
            out = []
            for name, K in plan.k_caps:
                # per-type-pair cutoff as a select chain: the 2D fancy
                # gather cut_mats[ti, cand_t] costs ~800 ms at 63M indices
                cm = cut_mats[name]
                T = cm.shape[0] - 1
                cut = jnp.zeros(cand_t.shape, dtype)
                for a in range(1, T + 1):
                    row = jnp.zeros(cand_t.shape, dtype)
                    for b in range(1, T + 1):
                        row = jnp.where(cand_t == b, cm[a, b], row)
                    cut = jnp.where(ti == a, row, cut)
                cut = cut + plan.skin
                m_tier = valid & (rsq < cut * cut)
                key = jnp.where(m_tier, rsq, BIG)
                if use_select_k:
                    from ..ops.select_k_pallas import select_k
                    Wp = -(-W // 128) * 128
                    padw = lambda a, f: jnp.pad(
                        a, ((0, 0), (0, Wp - W)), constant_values=f)
                    # id + type ride as in-kernel payloads (exact in f32:
                    # ids < 2^24); post-hoc gathers of the candidate
                    # arrays cost ~55 ms each
                    pos, idf, jtf = select_k(
                        padw(key, BIG), K,
                        interpret=use_select_k == "interpret",
                        payloads=(padw(cand, 0), padw(cand_t, 0)))
                    mask = pos < W
                    idx = jnp.where(mask, idf.astype(jnp.int32), 0)
                    jtype = jnp.where(mask, jtf.astype(jnp.int32), 0)
                else:
                    neg_vals, pos = jax.lax.top_k(-key, K)
                    mask = neg_vals > -BIG
                    # per-row gather (NOT a flat CH*W index: that product
                    # exceeds int32 at ~4M atoms/shard and OverflowErrors)
                    idx = jnp.take_along_axis(cand, pos, axis=1)
                    jtype = jnp.take_along_axis(cand_t, pos, axis=1)
                    idx = jnp.where(mask, idx, 0).astype(jnp.int32)
                    jtype = jnp.where(mask, jtype, 0).astype(jnp.int32)
                kmax_c = jnp.max(jnp.sum(m_tier, axis=1))
                out.append((idx, jtype, mask, kmax_c))
            return tuple(out)

        if nch == 1:
            tier_outs = [tuple(v[None] for v in t)
                         for t in chunk_body(tuple(v[0] for v in xs))]
        else:
            tier_outs = jax.lax.map(chunk_body, xs)

        for t_i, (name, K) in enumerate(plan.k_caps):
            idx_s, jt_s, mask_s, kmax_s = tier_outs[t_i]
            idx = idx_s.reshape(npr, K)[:n]
            jtype = jt_s.reshape(npr, K)[:n]
            mask = mask_s.reshape(npr, K)[:n]
            mirror = (_mirror_table(idx, mask, ghosts.owner, ghost_valid,
                                    sidx_ghost, inv_sidx, n, K)
                      if name in plan.mirror_tiers else None)
            # NOTE: a fully transposed [K, N] hot path was tried and is
            # 4x SLOWER end-to-end: gathers whose source is a 1-D column
            # ([M]) get flattened to {0:T(1024)} scalar-path fusions by
            # XLA (~35 ns/elem), while row gathers from [M, 3] with 2-D
            # indices stay vectorized.  Keep row-major lists — but ALSO
            # emit the [K, Np] transposed tables the Pallas force path
            # consumes: the step loop carries the neighbor data in its
            # while-loop state, so per-step transposes cannot be hoisted
            # by XLA (profiled ~14 ms/step of relayout copies at 98k
            # atoms); transposing once per rebuild removes them.
            tkw = {}
            if name in plan.mirror_tiers and mirror is not None:
                Np = -(-n // 128) * 128

                def _padT(a, fill):
                    return jnp.pad(jnp.swapaxes(a, 0, 1),
                                   ((0, 0), (0, Np - n)),
                                   constant_values=fill)

                mir_ok = mask & (mirror >= 0)
                mir_safe = jnp.maximum(mirror, 0)
                tkw = dict(
                    idxT=_padT(idx, 0), maskT=_padT(mask, False),
                    jtypeT=_padT(jtype, 0),
                    mirT=_padT(jnp.where(
                        mir_ok, (mir_safe % K) * Np + mir_safe // K, 0), 0),
                    mirvT=_padT(mir_ok, False))
                # windowed mirror-combine tables: the needed cyclic window
                # width is measured every rebuild (count:mirwin); when the
                # plan carries a window cap, emit localized indices so the
                # step gathers from per-chunk sub-tables under the
                # gather-class cliff (see RebuildPlan.mirror_window)
                B = plan.mirror_chunk
                t_slot = mir_safe % K            # [N, K] mirror slot
                m_col = mir_safe // K            # [N, K] mirror atom column
                ci_of = (jnp.arange(n, dtype=jnp.int32) // B)[:, None]
                half = Np // 2
                sd = jnp.mod(m_col - ci_of * B + half, Np) - half
                margin_e = jnp.maximum(
                    jnp.maximum(-sd, sd - (B - 1)), 0)
                margin_max = jnp.max(jnp.where(mir_ok, margin_e, 0))
                flags[f"count:mirwin:{name}"] = (
                    B + 2 * margin_max).astype(jnp.int32)
                # block-sparse reaction-combine tables + measured route
                # geometry (ops/react_pallas.py).  Counts are measured
                # whenever the geometry is tractable so the engine can
                # decide enablement; tables only when the plan carries
                # capacities.  Sharded rebuilds (valid != None) keep the
                # mirror-gather path for now.
                nch_r = Np // 128
                import os as _os
                _rflag = _os.environ.get("LPT_REACT", "0")
                if (valid is None and _rflag not in ("0", "off")
                        and ((n >= 8192 and nch_r <= 2048)
                             or _rflag == "force")):
                    from ..ops.react_pallas import build_route_tables
                    (rblocks, qoff, route, nw_n, kc_n, rq_n,
                     r_ovf) = build_route_tables(
                        idx, mask, mirror, ghosts.owner, n, K,
                        plan.react_nw, plan.react_kc, plan.react_qr)
                    flags[f"count:rnw:{name}"] = nw_n
                    flags[f"count:rkc:{name}"] = kc_n
                    flags[f"count:rq:{name}"] = rq_n
                    if plan.react_nw > 0:
                        flags[f"react_overflow:{name}"] = r_ovf
                        tkw["rblocks"] = rblocks
                        tkw["rqoff"] = qoff
                        tkw["route"] = route
                        tkw["react_qr"] = plan.react_qr
                W = plan.mirror_window
                if W > 0:
                    nch = -(-Np // B)
                    marg = (W - B) // 2
                    w0 = jnp.mod(
                        jnp.arange(nch, dtype=jnp.int32) * B - marg, Np)
                    off = jnp.mod(m_col - w0[ci_of[:, 0]][:, None], Np)
                    fits = off < W
                    loc = jnp.where(mir_ok & fits,
                                    t_slot * W + off, K * W)
                    flags[f"mirwin_overflow:{name}"] = jnp.any(
                        mir_ok & ~fits)
                    tkw["mirW"] = _padT(loc, K * W)
                    tkw["win0"] = w0
                    tkw["mirwin"] = W
                    tkw["mirchunk"] = B
            lists[name] = NeighborList(idx=idx, mask=mask, jtype=jtype,
                                       mirror=mirror, **tkw)
            kmax = jnp.max(kmax_s)
            flags[f"k_overflow:{name}"] = kmax > K
            flags[f"count:k:{name}"] = kmax

    # -- cell-form tiers: coarse dense table + half-offset neighbor map -----
    # (column 0 = the cell itself, then the 13 lexicographically-positive
    # offsets; each unordered cell pair appears exactly once)
    cells = None
    if plan.cell_tiers:
        from .build import CellData
        C = plan.cell_capacity
        if plan.cell_frac:
            # bin in wrapped fractional coordinates: interior cells tile
            # the prism exactly (uniform occupancy on triclinic boxes).
            # Ghost fractional coords are fw[owner] + integer shift; the
            # parked shift (1e5) of invalid ghosts is routed to the junk
            # row by valid_row before it could clip into a real cell.
            # Owned rows are clipped strictly below 1.0: f - floor(f)
            # rounds to exactly 1.0 in f32 for tiny negative f, which
            # would bin the atom into the halo ring outside a_range and
            # silently drop its force in the aslot remap.
            fb = jnp.clip(fw, 0.0, 1.0 - 2.0 ** -24)
            f_all = jnp.concatenate([fb, fw[owner] + gshift])
            s_vec = 1.0 / (np.array(plan.cell_dims, np.float64) - 2.0)
            dense_c, _, occc, ovc = _bin_dense(
                f_all, valid_row, jnp.asarray(-s_vec, dtype),
                jnp.asarray(s_vec, dtype), plan.cell_dims, C, m_all,
                interior_first=n)
        else:
            cmn = jnp.asarray(np.array(plan.cell_mn), dtype) + lo_off
            dense_c, _, occc, ovc = _bin_dense(
                x_all, valid_row, cmn, plan.cell_size, plan.cell_dims, C,
                m_all)
        flags["cell_overflow"] = ovc
        flags["count:cell"] = occc
        offs14 = np.array(
            [(0, 0, 0)] + [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1)
                           for c in (-1, 0, 1) if (a, b, c) > (0, 0, 0)],
            np.int32)
        nbid = _nbr_cell_ids(plan.cell_dims, offs14)
        cell_jt = jnp.where(dense_c < m_all, t_pad[dense_c],
                            0).astype(jnp.int32)
        # inverse table: owned atom -> flat slot in the a_range force grid
        # (one rebuild-time scatter so the per-step force remap is a
        # row gather; ghost/pad ids drop)
        Dx, Dy, Dz = plan.cell_dims
        (ax0, ax1), (ay0, ay1), (az0, az1) = plan.a_range
        Ay, Az = ay1 - ay0, az1 - az0
        ncell3 = Dx * Dy * Dz
        io = jnp.arange(ncell3 * C, dtype=jnp.int32)
        cellid, slot = io // C, io % C
        cx = cellid // (Dy * Dz)
        rem = cellid % (Dy * Dz)
        cy, cz = rem // Dz, rem % Dz
        aidx = (((cx - ax0) * Ay + (cy - ay0)) * Az + (cz - az0)) * C + slot
        aslot = jnp.zeros((n,), jnp.int32).at[
            dense_c[:ncell3].reshape(-1)].set(aidx, mode="drop")
        cells = CellData(table=dense_c, jtype=cell_jt,
                         nbr_map=jnp.asarray(nbid), n_owned=n,
                         dims=plan.cell_dims, a_range=plan.a_range,
                         cell_mn=plan.cell_mn, cell_size=plan.cell_size,
                         aslot=aslot)
    else:
        flags["cell_overflow"] = jnp.zeros((), bool)
        flags["count:cell"] = jnp.zeros((), jnp.int32)

    nbr = NeighborData(ghosts=ghosts, lists=lists, x_build=xw,
                       skin=plan.skin, cells=cells)
    return xw, image, nbr, flags
