"""Spatial decomposition over a TPU mesh — the distributed backend.

TPU-native replacement for the reference's MPI domain decomposition + ghost
communication (SURVEY.md section 2.4 / 5.8): atoms are partitioned into
contiguous slabs along x, each device owns one slab, and per-step halo
exchange moves the two adjacent slabs over ICI with `lax.ppermute` inside a
`shard_map`.  The three reference communication patterns map as:

  * setup Bcast of potentials      -> replicated device arrays (no-op)
  * forward_comm / reverse_comm    -> nothing: the sharded energy is
    differentiated through the shard_map, so the transpose of the halo
    ppermute IS the reverse-accumulation of ghost forces (pair_aeam.cpp:257
    and 307 both vanish into autodiff)
  * Allreduce of thermo scalars    -> psum / replicated-sum outputs

Correctness requirement (checked at build): every slab must be at least as
wide as the neighbor-list cutoff, so one slab of halo on each side covers
all interactions — the analogue of LAMMPS's ghost cutoff.  Periodic images
in y/z (and the x wrap at the mesh boundary) are static per-device ghost
tables referencing the extended [own | left | right] atom block.

Host-side construction is numpy; the step itself is one jitted function of
sharded pytrees.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.box import Box
from ..core.state import State
from ..fixes.base import StepContext
from ..neighbor.build import _find_pairs_np, _pairs_to_padded
from ..potentials.base import PairStyle

AXIS = "spatial"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SpatialShards:
    """Per-device slab data; every array's leading axis is the device axis.

    n = padded atoms per slab; extended block = [own | left | right] (3n);
    ghosts reference extended entries with integer cell shifts.
    """

    x: jnp.ndarray            # [Pn, n, 3] owned positions (slab-local)
    v: jnp.ndarray            # [Pn, n, 3]
    f: jnp.ndarray            # [Pn, n, 3]
    type_ext: jnp.ndarray     # [Pn, 3n] types of the extended block
    center_mask: jnp.ndarray  # [Pn, n] valid (non-pad) owned atoms
    halo_shift: jnp.ndarray   # [Pn, 2, 3] cell shift of left/right halo copy
    g_src: jnp.ndarray        # [Pn, Mg] ghost source in extended block
    g_shift: jnp.ndarray      # [Pn, Mg, 3] ghost cell shifts
    lists: Dict[str, jnp.ndarray]       # name -> idx [Pn, n, K]
    masks: Dict[str, jnp.ndarray]       # name -> mask [Pn, n, K]
    perm: jnp.ndarray         # [N] original-index -> (slab, slot) flat index

    def tree_flatten(self):
        names = tuple(sorted(self.lists))
        return ((self.x, self.v, self.f, self.type_ext, self.center_mask,
                 self.halo_shift, self.g_src, self.g_shift,
                 tuple(self.lists[n] for n in names),
                 tuple(self.masks[n] for n in names), self.perm), names)

    @classmethod
    def tree_unflatten(cls, names, ch):
        (x, v, f, te, cm, hs, gs, gsh, lists_t, masks_t, perm) = ch
        return cls(x, v, f, te, cm, hs, gs, gsh,
                   dict(zip(names, lists_t)), dict(zip(names, masks_t)), perm)

    @property
    def n_devices(self):
        return self.x.shape[0]

    @property
    def slab_capacity(self):
        return self.x.shape[1]


def build_shards(state: State, pair: PairStyle, n_devices: int,
                 skin: float = 2.0, pad_multiple: int = 8) -> SpatialShards:
    """Partition a State into slab shards + static halo/ghost/list tables."""
    x_np, _ = state.box.wrap_np(np.asarray(state.x))
    t_np = np.asarray(state.type)
    h = state.box.h_np()
    lo = state.box.lo_np()
    hinv = np.linalg.inv(h)
    frac = (x_np - lo) @ hinv
    N = len(x_np)
    Pn = n_devices

    requests = {k: np.asarray(v, np.float64)
                for k, v in pair.neighbor_requests().items()}
    list_cut = max(float(v.max()) for v in requests.values()) + skin

    # slab width check (the ghost-cutoff invariant)
    widths = state.box.perpendicular_widths_np()
    slab_width = widths[0] / Pn
    if slab_width < list_cut:
        raise ValueError(
            f"slab width {slab_width:.2f} A < list cutoff {list_cut:.2f} A: "
            f"box too small in x for {Pn}-way spatial decomposition")

    # geometric slabs along fractional x
    slab_of = np.clip((frac[:, 0] * Pn).astype(np.int64), 0, Pn - 1)
    counts = np.bincount(slab_of, minlength=Pn)
    n = int(counts.max())
    n = max(pad_multiple, -(-n // pad_multiple) * pad_multiple)

    dtype = np.float64
    xs = np.zeros((Pn, n, 3), dtype)
    # park padding far away so it can never enter a cutoff
    xs[..., 0] = 1e6
    ts = np.ones((Pn, n), np.int32)
    cmask = np.zeros((Pn, n), bool)
    # vectorized slab packing: stable sort by slab, then slot = rank
    # within the slab (order preserves original index order per slab,
    # matching the old per-atom loop exactly)
    order = np.argsort(slab_of, kind="stable")
    starts = np.zeros(Pn + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    slot_sorted = np.arange(N) - starts[slab_of[order]]
    perm = np.empty(N, np.int64)
    perm[order] = slab_of[order] * n + slot_sorted
    d_all, s_all = slab_of, perm[np.arange(N)] % n
    xs[d_all, s_all] = x_np
    ts[d_all, s_all] = t_np
    cmask[d_all, s_all] = True

    # halo wrap shifts: left halo comes from slab (d-1)%P — shifted by -a
    # when it wraps; right halo from (d+1)%P — shifted by +a on wrap
    halo_shift = np.zeros((Pn, 2, 3), dtype)
    halo_shift[0, 0, 0] = -1.0
    halo_shift[Pn - 1, 1, 0] = 1.0

    # per-device extended block + ghosts + neighbor lists (host numpy)
    margins = (list_cut + skin) / widths
    nrep_y = int(np.ceil((list_cut + skin) / widths[1])) if state.box.periodic[1] else 0
    nrep_z = int(np.ceil((list_cut + skin) / widths[2])) if state.box.periodic[2] else 0

    g_src_l, g_shift_l, idx_l, msk_l = [], [], [], {k: [] for k in requests}
    idx_per_req = {k: [] for k in requests}
    mask_per_req = {k: [] for k in requests}
    Kmax = {k: 0 for k in requests}
    Mgmax = 0

    ext_x_all, ext_t_all = [], []
    for d in range(Pn):
        left, right = (d - 1) % Pn, (d + 1) % Pn
        x_ext = np.concatenate([
            xs[d], xs[left] + halo_shift[d, 0] @ h,
            xs[right] + halo_shift[d, 1] @ h])
        t_ext = np.concatenate([ts[d], ts[left], ts[right]])
        ext_x_all.append(x_ext)
        ext_t_all.append(t_ext)

        # ghosts: y/z periodic images of extended atoms near this slab
        own_flo = d / Pn - margins[0]
        own_fhi = (d + 1) / Pn + margins[0]
        fe = (x_ext - lo) @ hinv
        gsrc, gshift = [], []
        for sy in range(-nrep_y, nrep_y + 1):
            for sz in range(-nrep_z, nrep_z + 1):
                if sy == 0 and sz == 0:
                    continue
                fi = fe + np.array([0.0, sy, sz])
                keep = ((fi[:, 0] >= own_flo) & (fi[:, 0] <= own_fhi)
                        & (fi[:, 1] >= -margins[1])
                        & (fi[:, 1] <= 1 + margins[1])
                        & (fi[:, 2] >= -margins[2])
                        & (fi[:, 2] <= 1 + margins[2]))
                # never ghost padding atoms
                keep &= np.concatenate([cmask[d], cmask[left], cmask[right]])
                ids = np.nonzero(keep)[0]
                if ids.size:
                    gsrc.append(ids)
                    gshift.append(np.broadcast_to(
                        np.array([0.0, sy, sz]), (ids.size, 3)).copy())
        gsrc = (np.concatenate(gsrc).astype(np.int32) if gsrc
                else np.zeros(0, np.int32))
        gshift = (np.concatenate(gshift) if len(gshift)
                  else np.zeros((0, 3)))
        g_src_l.append(gsrc)
        g_shift_l.append(gshift)
        Mgmax = max(Mgmax, len(gsrc))

        # neighbor lists: centers = own slab rows, targets = ext + ghosts
        x_all = np.concatenate([x_ext, x_ext[gsrc] + gshift @ h])
        t_all = np.concatenate([t_ext, t_ext[gsrc]])
        pi, pj, rsq = _find_pairs_np(xs[d], x_all, list_cut)
        # drop pad-atom centers
        ok = cmask[d][pi]
        pi, pj, rsq = pi[ok], pj[ok], rsq[ok]
        for name, cut in requests.items():
            pc = (np.full(len(pi), float(cut)) if cut.ndim == 0
                  else cut[ts[d][pi], t_all[pj]])
            sel = rsq < (pc + skin) ** 2
            idx, mask = _pairs_to_padded(pi[sel], pj[sel], n, pad_multiple)
            idx_per_req[name].append(idx)
            mask_per_req[name].append(mask)
            Kmax[name] = max(Kmax[name], idx.shape[1])

    # pad ghost tables and lists to uniform shapes
    g_src = np.zeros((Pn, max(Mgmax, 1)), np.int32)
    g_shift = np.zeros((Pn, max(Mgmax, 1), 3), dtype)
    # padding ghosts point at extended slot 0 with huge shift (harmless,
    # never in any list)
    g_shift[..., 0] = 1e5
    for d in range(Pn):
        m = len(g_src_l[d])
        if m:
            g_src[d, :m] = g_src_l[d]
            g_shift[d, :m] = g_shift_l[d]

    lists, masks = {}, {}
    for name in requests:
        K = max(Kmax[name], 8)
        idx = np.zeros((Pn, n, K), np.int32)
        msk = np.zeros((Pn, n, K), bool)
        for d in range(Pn):
            a = idx_per_req[name][d]
            b = mask_per_req[name][d]
            idx[d, :, :a.shape[1]] = a
            msk[d, :, :b.shape[1]] = b
        lists[name] = jnp.asarray(idx)
        masks[name] = jnp.asarray(msk)

    jdtype = state.x.dtype
    v_np = np.asarray(state.v)
    vs = np.zeros((Pn, n, 3), dtype)
    vs[d_all, s_all] = v_np

    return SpatialShards(
        x=jnp.asarray(xs, jdtype), v=jnp.asarray(vs, jdtype),
        f=jnp.asarray(np.zeros((Pn, n, 3)), jdtype),
        type_ext=jnp.asarray(np.stack(ext_t_all)),
        center_mask=jnp.asarray(cmask),
        halo_shift=jnp.asarray(halo_shift, jdtype),
        g_src=jnp.asarray(g_src), g_shift=jnp.asarray(g_shift, jdtype),
        lists=lists, masks=masks, perm=jnp.asarray(perm))


# ---------------------------------------------------------------------------
# sharded energy / step
# ---------------------------------------------------------------------------

def _local_energy(pair, n_dev, names, x_me, strain, type_ext, halo_shift,
                  g_src, g_shift, lists_t, masks_t, h, cmask):
    """Per-device energy over locally-centered edges (runs inside shard_map).

    shard_map hands each device its block WITH the sharded axis kept at
    size 1, so every sharded argument is squeezed on entry.
    """
    x_me = x_me[0]
    type_ext = type_ext[0]
    halo_shift = halo_shift[0]
    g_src = g_src[0]
    g_shift = g_shift[0]
    lists_t = tuple(t[0] for t in lists_t)
    masks_t = tuple(t[0] for t in masks_t)
    cmask = cmask[0]

    # halo exchange: receive left and right neighbor slabs over ICI.
    # fwd sends each shard to its right neighbor => received = left slab.
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    x_left = jax.lax.ppermute(x_me, AXIS, fwd)
    x_right = jax.lax.ppermute(x_me, AXIS, bwd)
    hd = h.astype(x_me.dtype)

    def shift_cart(s):
        # component-wise, not @: TPU f32 matmul is bf16 by default
        return jnp.stack([s[0] * hd[0, a] + s[1] * hd[1, a]
                          + s[2] * hd[2, a] for a in range(3)])

    x_ext = jnp.concatenate([
        x_me,
        x_left + shift_cart(halo_shift[0]),
        x_right + shift_cart(halo_shift[1])], axis=0)

    # assemble a NeighborData-shaped view and reuse the pair's energy
    from ..neighbor.neighbor import Ghosts, NeighborList
    from ..neighbor.build import NeighborData
    n = x_me.shape[0]
    ghosts = Ghosts(owner=g_src, shift=g_shift)
    nlists = {}
    for name, idx, msk in zip(names, lists_t, masks_t):
        # lift [n, K] center lists to [3n, K] rows (centers are rows 0..n)
        K = idx.shape[1]
        idx_full = jnp.zeros((3 * n, K), jnp.int32).at[:n].set(idx)
        msk_full = jnp.zeros((3 * n, K), bool).at[:n].set(
            msk & cmask[:, None])
        nlists[name] = NeighborList(idx=idx_full, mask=msk_full)
    nbr = NeighborData(ghosts=ghosts, lists=nlists, x_build=x_ext, skin=0.0)
    center_mask = jnp.zeros(3 * n, bool).at[:n].set(cmask)
    e_local = pair.energy(x_ext, strain, type_ext, nbr, hd,
                          center_mask=center_mask)
    return jax.lax.psum(e_local, AXIS)


def make_sharded_efv(pair: PairStyle, mesh: Mesh, h, shards: SpatialShards):
    """Returns f(xs) -> (E, F [Pd,n,3], W) with forces from autodiff
    THROUGH the shard_map — the ppermute transpose delivers halo reaction
    forces (no reverse_comm)."""
    spec = P(AXIS)
    rep = P()
    n_dev = mesh.devices.size
    names = tuple(sorted(shards.lists))

    local = partial(_local_energy, pair, n_dev, names)
    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, rep, spec, spec, spec, spec,
                  tuple(spec for _ in names), tuple(spec for _ in names),
                  rep, spec),
        out_specs=rep)

    def energy_of(xs, strain):
        return sharded(xs, strain, shards.type_ext, shards.halo_shift,
                       shards.g_src, shards.g_shift,
                       tuple(shards.lists[n] for n in names),
                       tuple(shards.masks[n] for n in names),
                       h, shards.center_mask)

    def efv(xs):
        strain0 = jnp.zeros((3, 3), xs.dtype)
        E, (gx, gs) = jax.value_and_grad(
            energy_of, argnums=(0, 1))(xs, strain0)
        return E, -gx, -gs

    return efv


def make_sharded_nve_step(pair: PairStyle, mesh: Mesh, h, masses,
                          ctx: StepContext, shards: SpatialShards):
    """Full sharded MD step: halo-exchange force evaluation + velocity
    Verlet.  The integrator is elementwise on sharded arrays (no
    communication); only the force pass talks over ICI."""
    efv = make_sharded_efv(pair, mesh, h, shards)
    masses = jnp.asarray(masses)
    n = shards.slab_capacity
    type_own = shards.type_ext[:, :n]

    def step(shards: SpatialShards):
        m = masses[type_own][..., None].astype(shards.x.dtype)
        cm = shards.center_mask[..., None]
        v = shards.v + ctx.dtf * shards.f / m * cm
        x = shards.x + ctx.dt * v * cm
        E, F, W = efv(x)
        v = v + ctx.dtf * F / m * cm
        shards = dataclasses.replace(shards, x=x, v=v, f=F)
        return shards, E, W

    return step
