"""Fixed-shape neighbor structures — TPU-native equivalent of LAMMPS lists.

LAMMPS builds ragged binned lists (ilist/numneigh/firstneigh, MyPage pools —
pair_rebomos.cpp:281-352) plus ghost atoms maintained by MPI communication.
The TPU-native design replaces both with:

  * `Ghosts`: a static (per-rebuild) table of periodic images — (owner atom,
    integer cell shift).  Ghost *positions* are recomputed from owned
    positions inside every energy evaluation, so d(ghost)/d(owner) = identity
    and autodiff delivers image reaction forces with no reverse-comm
    (pair_aeam.cpp:257 comm->reverse_comm has no analogue here).
  * `NeighborList`: dense padded [N, K] int32 indices into the
    owned+ghost position array, plus a validity mask.  Padded slots are
    masked in every energy term; no pointers, no pages, no overflow errors
    (cf. pair_rebomos.cpp:349-350).

All structures are pytrees of device arrays with static shapes; the *build*
step runs host-side (numpy cell binning, see build.py) and is amortized over
many fused simulation steps via the half-skin displacement trigger.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Ghosts:
    """Periodic-image table: ghost g is owner[g] translated by shift[g] @ H."""

    owner: jnp.ndarray   # [Mg] int32 indices into owned atoms
    shift: jnp.ndarray   # [Mg,3] image shifts (float dtype for the matmul)

    def tree_flatten(self):
        return (self.owner, self.shift), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def count(self) -> int:
        return self.owner.shape[0]

    def all_positions(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        """[N+Mg, 3] owned positions followed by ghost images (differentiable
        w.r.t. x — the heart of the no-comm force design).

        The shift*h product is written out component-wise: on TPU a `@`
        matmul routes f32 through the MXU at bfloat16 precision by default,
        which displaced ghost images by up to ~0.6 A in a 280 A box and
        silently corrupted energies at scale.
        """
        s = self.shift.astype(x.dtype)
        h = h.astype(x.dtype)
        cols = [s[:, 0] * h[0, a] + s[:, 1] * h[1, a] + s[:, 2] * h[2, a]
                for a in range(3)]
        ghost_x = x[self.owner] + jnp.stack(cols, axis=1)
        return jnp.concatenate([x, ghost_x], axis=0)

    def all_types(self, types: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([types, types[self.owner]], axis=0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NeighborList:
    """Dense padded neighbor list over owned centers.

    idx[i, k] indexes into the [N+Mg] owned+ghost array; mask[i, k] marks
    valid slots.  Padded idx entries are 0 (safe to gather; always masked).

    jtype optionally caches the per-edge neighbor atom TYPE (types are
    static between rebuilds): a per-step el_all[idx] gather costs ~9 ns per
    edge on TPU, so precomputing it at rebuild removes a large-array gather
    from every force evaluation.
    """

    idx: jnp.ndarray    # [N, K] int32
    mask: jnp.ndarray   # [N, K] bool
    jtype: jnp.ndarray | None = None   # [N, K] int32 neighbor type
    #: flat [N*K] slot of each edge's MIRROR edge (the unique reverse edge
    #: (owner(j), image-of-i) — the newton-pair bijection).  Lets force
    #: accumulation replace the per-edge scatter-add with a row gather.
    mirror: jnp.ndarray | None = None  # [N, K] int32
    #: rebuild-time transposed tables for the [K, Np]-layout force path
    #: (Np = N padded to 128 lanes).  The step loop carries the neighbor
    #: data through its while-loop state, so XLA cannot hoist per-step
    #: [N,K]→[K,Np] transposes out of the loop — 4 relayout copies of
    #: ~10 MB each per STEP at 98k atoms (profiled ~25% of the step).
    #: Computing them once per rebuild makes the step consume them as-is.
    idxT: jnp.ndarray | None = None    # [K, Np] int32
    maskT: jnp.ndarray | None = None   # [K, Np] bool
    jtypeT: jnp.ndarray | None = None  # [K, Np] int32
    mirT: jnp.ndarray | None = None    # [K, Np] int32, flat k'*Np + j
    mirvT: jnp.ndarray | None = None   # [K, Np] bool
    #: windowed mirror tables (see device_build): localized flat index
    #: t*W + cyclic_offset into a per-chunk [K*W(+1 sentinel)] window of
    #: the cotangent table; sentinel K*W for invalid edges.  Lets the
    #: combine gather ride the small-table class (~2x per index;
    #: probe_mirror17: the gather cost cliffs on operand physical size).
    mirW: jnp.ndarray | None = None    # [K, Np] int32 localized indices
    win0: jnp.ndarray | None = None    # [nch] int32 window starts (cyclic)
    #: block-sparse reaction-combine tables (ops/react_pallas.py): per
    #: 128-atom target chunk, the marked 128-column source blocks and the
    #: packed (k_src << 8 | target_lane) route entries — the rebuild-time
    #: structure that lets the step-time reaction accumulation run as
    #: dense VPU work instead of the ~10 ms mirror gather
    rblocks: jnp.ndarray | None = None  # [nch, NW] int32 source block ids
    rqoff: jnp.ndarray | None = None    # [nch, NW] int32 packed row offsets
    route: jnp.ndarray | None = None    # [nch, NW, KC, 128] int32 packed
    #: static window geometry (aux data, compile-time constants)
    mirwin: int | None = None          # W: window width in columns
    mirchunk: int | None = None        # B: output chunk width
    react_qr: int | None = None        # QR: packed route-row capacity

    _OPT = ("jtype", "mirror", "idxT", "maskT", "jtypeT", "mirT", "mirvT",
            "mirW", "win0", "rblocks", "rqoff", "route")

    def tree_flatten(self):
        children = [self.idx, self.mask]
        flags = tuple(getattr(self, f) is not None for f in self._OPT)
        for f, have in zip(self._OPT, flags):
            if have:
                children.append(getattr(self, f))
        return tuple(children), (flags, self.mirwin, self.mirchunk,
                                 self.react_qr)

    @classmethod
    def tree_unflatten(cls, aux, children):
        flags, mirwin, mirchunk, react_qr = aux
        it = iter(children)
        kw = {"idx": next(it), "mask": next(it),
              "mirwin": mirwin, "mirchunk": mirchunk,
              "react_qr": react_qr}
        for f, have in zip(cls._OPT, flags):
            kw[f] = next(it) if have else None
        return cls(**kw)

    @property
    def capacity(self) -> int:
        return self.idx.shape[1]


def edge_components(x: jnp.ndarray, ghosts: Ghosts, nlist: NeighborList,
                    h: jnp.ndarray, strain: jnp.ndarray | None = None,
                    row_gather: bool = False):
    """Per-edge displacement components (dx, dy, dz) as three [N, K] arrays.

    TPU layout note: a [N, K, 3] displacement tensor gets its minor dim
    padded to the 128-lane tile — a 42x memory blowup that OOMs at
    100k-atom scale (observed: a 4.9 GB logical intermediate allocated as
    208 GB).  Keeping each Cartesian component as its own [N, K] array
    makes K the minor dim, which tiles natively.

    row_gather=True fetches all three components with ONE row gather
    x_all[idx] ([N,K,3]) and immediately unstacks: TPU gather cost is
    ~15 ns per INDEX (row width nearly free), so one 3-wide row gather is
    ~4x cheaper than three element gathers (measured 34 ms vs 136 ms for
    [98k,32] from 196k rows).  The [N,K,3] tensor exists only as the
    gather result in HBM, never as a 128-lane-padded VMEM operand.  Use
    for small-K tiers where the index cost dominates.

    Strain enters as d'_a = d_a + sum_b d_b * strain[b, a] (the virial
    trick; see edge_vectors).
    """
    x_all = ghosts.all_positions(x, h)
    idx = nlist.idx
    if row_gather:
        rows = x_all[idx]                                # [N, K, 3]
        comps = [rows[..., a] - x[:, a][:, None] for a in range(3)]
    else:
        comps = []
        for a in range(3):
            col = x_all[:, a]
            comps.append(col[idx] - x[:, a][:, None])
    if strain is not None:
        d0, d1, d2 = comps
        comps = [comps[a] + d0 * strain[0, a] + d1 * strain[1, a]
                 + d2 * strain[2, a] for a in range(3)]
    dx, dy, dz = comps
    rsq = dx * dx + dy * dy + dz * dz
    rsq_safe = jnp.where(nlist.mask, rsq, 1.0)
    return dx, dy, dz, rsq_safe, nlist.mask


def mirror_combine(gx, gy, gz, nlist: NeighborList):
    """Atom forces from per-edge cotangents G = dE/dd via the mirror-edge
    bijection: F_i = sum_k G[i,k] - sum_k G[mirror(i,k)] — the scatter-free
    TPU replacement for newton-pair reverse accumulation
    (pair_aeam.cpp:257).  Requires nlist.mirror (device rebuild)."""
    # Per-component consumer form + sentinel zero row: consuming the
    # gathered rows as three planes (not a 3-minor reduce) keeps the
    # source table row-major on TPU — the minor-reduce consumer drove
    # XLA to a component-plane layout whose row gather ran ~4x slower
    # (probed in-situ at 98k atoms).  Dead slots gather the appended
    # zero row, so no validity multiply is needed.
    N, K = gx.shape
    grows = jnp.concatenate(
        [jnp.stack([gx, gy, gz], axis=-1).reshape(N * K, 3),
         jnp.zeros((1, 3), gx.dtype)], axis=0)
    ok = nlist.mask & (nlist.mirror >= 0)
    mirS = jnp.where(ok, nlist.mirror, N * K).reshape(-1)
    gmir = grows[mirS].reshape(N, K, 3)
    fx = jnp.sum(gx, axis=1) - jnp.sum(gmir[..., 0], axis=1)
    fy = jnp.sum(gy, axis=1) - jnp.sum(gmir[..., 1], axis=1)
    fz = jnp.sum(gz, axis=1) - jnp.sum(gmir[..., 2], axis=1)
    return jnp.stack([fx, fy, fz], axis=-1)


def edge_vectors(x: jnp.ndarray, ghosts: Ghosts, nlist: NeighborList,
                 h: jnp.ndarray, strain: jnp.ndarray | None = None):
    """Per-edge displacement vectors d[i,k] = x_neighbor - x_center.

    `strain` (3x3, typically zeros) implements the virial as a strain
    derivative: every energy term depends on positions only through these
    displacement vectors, so W = -dE/dstrain equals the ev_tally /
    virial_fdotr accumulation of the reference (pair_rebomos.cpp:110) for
    conservative forces.

    Returns (d [N,K,3], rsq_safe [N,K], mask).  rsq on masked slots is
    replaced by 1.0 so sqrt/reciprocal never see zero (autodiff-safe padding).
    """
    x_all = ghosts.all_positions(x, h)
    d = x_all[nlist.idx] - x[:, None, :]
    if strain is not None:
        d = d @ (jnp.eye(3, dtype=d.dtype) + strain)
    rsq = jnp.sum(d * d, axis=-1)
    rsq_safe = jnp.where(nlist.mask, rsq, 1.0)
    return d, rsq_safe, nlist.mask
