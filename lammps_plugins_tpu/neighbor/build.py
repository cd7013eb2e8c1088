"""Host-side neighbor construction: ghost images + cell-binned padded lists.

This is the TPU analogue of LAMMPS's Neighbor::build + Comm ghost setup
(SURVEY.md section 2.4).  The build runs on host in numpy (rebuilds are rare —
triggered by the half-skin displacement check, like LAMMPS `neigh_modify
check yes`), produces fixed-shape device arrays, and the simulation then runs
many fused steps against the static tables.

Per-type-pair cutoffs are supported the way the reference uses them: the
"master" list uses the pair style's global cutoff (pair_rebomos.cpp:257
cut3rebo) while the "rebo" sub-list uses rcmax per type pair
(pair_rebomos.cpp:337).  Lists built here carry `skin` slack; exact cutoff
semantics are enforced analytically inside the energy kernels (the REBO
switching function Sp is identically zero at r >= rcmax, pair_rebomos.h:195-211,
so slack membership is physics-neutral).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box import Box
from .neighbor import Ghosts, NeighborList


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CellData:
    """Dense cell decomposition for gather-free pair compute.

    The cell table maps (cell, slot) -> atom index in the owned+ghost
    array; a pair tier evaluated in cell form processes [C, C] blocks
    between each cell and its 27 neighbors as fully regular tensor ops —
    no per-edge index gathers (XLA TPU gathers cost ~9 ns/index, which
    made [N, K] LJ evaluation 30x slower than the arithmetic).
    """

    table: jnp.ndarray     # [ncells+2, C] int32 atom ids (m_all = pad)
    jtype: jnp.ndarray     # [ncells+2, C] int32 atom types (0 = pad)
    nbr_map: jnp.ndarray   # [ncells, 14] half-offset neighbor cell ids
                           # (col 0 = the cell itself; static geometry)
    n_owned: int           # aux: atoms with id < n_owned are owned centers
    # static geometry for the Pallas cell-pair kernel (None when the cells
    # came from a pre-halo build): grid dims INCLUDING the one-cell empty
    # halo ring, the (start, stop) cell box covering owned atoms, and the
    # grid origin/edge used for in-kernel coordinate re-centering
    dims: "tuple | None" = None
    a_range: "tuple | None" = None
    cell_mn: "tuple | None" = None
    cell_size: "float | None" = None
    #: [n_owned] int32: each owned atom's flat (cell, slot) index into the
    #: a_range-restricted [Ax*Ay*Az*C] grid — lets the force remap be a
    #: row GATHER (F3_flat[aslot]) instead of a scatter-set (measured
    #: 2.1 ms/step scatter vs ~0.2 ms gather at 98k atoms)
    aslot: "jnp.ndarray | None" = None

    def tree_flatten(self):
        children = [self.table, self.jtype, self.nbr_map]
        have = self.aslot is not None
        if have:
            children.append(self.aslot)
        return tuple(children), (self.n_owned, self.dims, self.a_range,
                                 self.cell_mn, self.cell_size, have)

    @classmethod
    def tree_unflatten(cls, aux, children):
        n_owned, dims, a_range, cell_mn, cell_size, have = aux
        table, jtype, nbr_map = children[:3]
        aslot = children[3] if have else None
        return cls(table, jtype, nbr_map, n_owned=n_owned, dims=dims,
                   a_range=a_range, cell_mn=cell_mn, cell_size=cell_size,
                   aslot=aslot)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NeighborData:
    """Everything an energy function needs, rebuilt together."""

    ghosts: Ghosts
    lists: Dict[str, NeighborList]
    x_build: jnp.ndarray      # positions at build time (rebuild trigger)
    skin: float               # aux (static)
    cells: "CellData | None" = None

    def tree_flatten(self):
        names = tuple(sorted(self.lists))
        children = (self.ghosts, tuple(self.lists[n] for n in names),
                    self.x_build, self.cells)
        return children, (names, self.skin)

    @classmethod
    def tree_unflatten(cls, aux, children):
        names, skin = aux
        ghosts, lists_t, x_build, cells = children
        return cls(ghosts, dict(zip(names, lists_t)), x_build, skin, cells)

    def max_displacement_sq(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x - self.x_build
        return jnp.max(jnp.sum(d * d, axis=-1))

    def needs_rebuild(self, x) -> bool:
        """Half-skin displacement criterion (LAMMPS Neighbor::check_distance)."""
        return bool(self.max_displacement_sq(x) > (0.5 * self.skin) ** 2)


# ---------------------------------------------------------------------------
# ghost images
# ---------------------------------------------------------------------------

def build_ghosts_np(x: np.ndarray, box: Box, cutoff: float):
    """Enumerate periodic images within `cutoff` of the box (numpy).

    Equivalent of the LAMMPS ghost-atom setup (log.rebomos-bulk.1:74 reports
    4285 ghosts for 288 owned at a 13.4 A ghost cutoff).  Selection is a
    conservative per-axis fractional slab test using the perpendicular box
    widths, so every image that could interact is included.
    """
    h = box.h_np()
    lo = box.lo_np()
    widths = box.perpendicular_widths_np()
    periodic = box.periodic

    frac = (x - lo) @ np.linalg.inv(h)
    margins = cutoff / widths

    nrep = [int(np.ceil(cutoff / widths[d])) if periodic[d] else 0
            for d in range(3)]

    owners, shifts = [], []
    for sx in range(-nrep[0], nrep[0] + 1):
        for sy in range(-nrep[1], nrep[1] + 1):
            for sz in range(-nrep[2], nrep[2] + 1):
                if sx == 0 and sy == 0 and sz == 0:
                    continue
                s = np.array([sx, sy, sz], dtype=np.float64)
                fi = frac + s
                keep = np.ones(len(x), dtype=bool)
                for d in range(3):
                    keep &= (fi[:, d] >= -margins[d]) & (fi[:, d] <= 1.0 + margins[d])
                idx = np.nonzero(keep)[0]
                if idx.size:
                    owners.append(idx)
                    shifts.append(np.broadcast_to(s, (idx.size, 3)))
    if owners:
        owner = np.concatenate(owners).astype(np.int32)
        shift = np.concatenate(shifts)
    else:
        owner = np.zeros((0,), np.int32)
        shift = np.zeros((0, 3), np.float64)
    return owner, shift


# ---------------------------------------------------------------------------
# cell-binned pair search
# ---------------------------------------------------------------------------

def _find_pairs_np(x_own: np.ndarray, x_all: np.ndarray, rcut: float):
    """All (i, j, rsq) with i owned, j in owned+ghosts, j != i, r < rcut.

    Dispatches to the native C++ cell-binned search (ops/neighbor_native.cpp,
    threaded) when available; falls back to the vectorized-numpy binning
    below.  Both return identical pair sets (order differs; downstream
    padding re-sorts by center).
    """
    from ..ops import native
    res = native.find_pairs(x_own, x_all, rcut)
    if res is not None:
        return res
    return _find_pairs_numpy(x_own, x_all, rcut)


def _find_pairs_numpy(x_own: np.ndarray, x_all: np.ndarray, rcut: float):
    """Pure-numpy fallback pair search (same contract as _find_pairs_np)."""
    n_own = len(x_own)
    mn = x_all.min(axis=0) - 1e-9
    cell_all = np.floor((x_all - mn) / rcut).astype(np.int64)
    dims = cell_all.max(axis=0) + 1
    cid_all = (cell_all[:, 0] * dims[1] + cell_all[:, 1]) * dims[2] + cell_all[:, 2]

    order = np.argsort(cid_all, kind="stable")
    sorted_cid = cid_all[order]

    cell_own = cell_all[:n_own]
    # group owned atoms by cell
    own_order = np.argsort(cid_all[:n_own], kind="stable")
    own_cids, own_starts = np.unique(cid_all[:n_own][own_order],
                                     return_index=True)
    own_counts = np.diff(np.append(own_starts, n_own))

    offsets = np.array([(a, b, c)
                        for a in (-1, 0, 1) for b in (-1, 0, 1)
                        for c in (-1, 0, 1)], dtype=np.int64)

    rcut_sq = rcut * rcut
    pi_parts, pj_parts, rsq_parts = [], [], []

    for cid, start, count in zip(own_cids, own_starts, own_counts):
        ids = own_order[start:start + count]           # owned atoms this cell
        cc = cell_own[ids[0]]
        # candidate atoms from the 27 surrounding cells
        ncells = cc[None, :] + offsets
        valid = np.all((ncells >= 0) & (ncells < dims[None, :]), axis=1)
        ncids = (ncells[valid, 0] * dims[1] + ncells[valid, 1]) * dims[2] \
            + ncells[valid, 2]
        lo_i = np.searchsorted(sorted_cid, ncids, side="left")
        hi_i = np.searchsorted(sorted_cid, ncids, side="right")
        cand = np.concatenate([order[a:b] for a, b in zip(lo_i, hi_i)])
        d = x_all[cand][None, :, :] - x_own[ids][:, None, :]
        rsq = np.einsum("ijk,ijk->ij", d, d)
        hit = rsq < rcut_sq
        hit &= cand[None, :] != ids[:, None]            # exclude self
        ii, jj = np.nonzero(hit)
        pi_parts.append(ids[ii])
        pj_parts.append(cand[jj])
        rsq_parts.append(rsq[ii, jj])

    if pi_parts:
        return (np.concatenate(pi_parts).astype(np.int32),
                np.concatenate(pj_parts).astype(np.int32),
                np.concatenate(rsq_parts))
    return (np.zeros(0, np.int32), np.zeros(0, np.int32), np.zeros(0))


def _pairs_to_padded(pi, pj, n, pad_multiple=8):
    """CSR-style (i, j) pair arrays -> dense padded [N, K] idx + mask."""
    order = np.argsort(pi, kind="stable")
    pi, pj = pi[order], pj[order]
    counts = np.bincount(pi, minlength=n)
    k = int(counts.max()) if len(pi) else 0
    k = max(pad_multiple, -(-k // pad_multiple) * pad_multiple)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(len(pi)) - starts[pi]
    idx = np.zeros((n, k), dtype=np.int32)
    mask = np.zeros((n, k), dtype=bool)
    idx[pi, slot] = pj
    mask[pi, slot] = True
    return idx, mask


# ---------------------------------------------------------------------------
# top-level build
# ---------------------------------------------------------------------------

def build_neighbor_data(x, types, box: Box, requests: Mapping[str, np.ndarray],
                        skin: float = 2.0, pad_multiple: int = 8,
                        dtype=None) -> NeighborData:
    """Build ghosts + all requested neighbor lists.

    Args:
      x: [N,3] positions (device or host).
      types: [N] 1-based types.
      requests: name -> cutoff; scalar, or [T+1,T+1] per-type-pair matrix
        (1-based indexing like LAMMPS setflag/cut arrays).
      skin: slack added to every cutoff (LAMMPS `neighbor <skin> bin`).
    """
    x_np = np.asarray(x, dtype=np.float64)
    t_np = np.asarray(types)
    dtype = dtype or getattr(x, "dtype", np.float64)

    cut_mats = {}
    global_max = 0.0
    for name, cut in requests.items():
        cut = np.asarray(cut, dtype=np.float64)
        cut_mats[name] = cut
        global_max = max(global_max, float(cut.max()))

    list_cut = global_max + skin
    owner, shift = build_ghosts_np(x_np, box, list_cut + skin)

    h = box.h_np()
    x_all = np.concatenate([x_np, x_np[owner] + shift @ h], axis=0)
    t_all = np.concatenate([t_np, t_np[owner]])

    pi, pj, rsq = _find_pairs_np(x_np, x_all, list_cut)

    lists = {}
    for name, cut in cut_mats.items():
        if cut.ndim == 0:
            pair_cut = np.full(len(pi), float(cut))
        else:
            pair_cut = cut[t_np[pi], t_all[pj]]
        sel = rsq < (pair_cut + skin) ** 2
        idx, mask = _pairs_to_padded(pi[sel], pj[sel], len(x_np), pad_multiple)
        jtype = np.where(mask, t_all[idx], 0).astype(np.int32)
        lists[name] = NeighborList(idx=jnp.asarray(idx),
                                   mask=jnp.asarray(mask),
                                   jtype=jnp.asarray(jtype))

    ghosts = Ghosts(owner=jnp.asarray(owner),
                    shift=jnp.asarray(shift, dtype=dtype))
    return NeighborData(ghosts=ghosts, lists=lists,
                        x_build=jnp.asarray(x_np, dtype=dtype), skin=skin)
