"""REBOMoS — REBO bond-order potential for Mo-S (TPU-native).

Physics from /root/reference/USER-REBOMOS/pair_rebomos.{h,cpp} (Liang,
Phillpot & Sinnott 2009 + erratum; Stewart & Spearot 2013), re-designed for
TPU rather than translated:

  * One differentiable energy over padded [N,K] neighbor tensors; forces are
    autodiff gradients.  The reference's entire bondorder() force machinery
    (pair_rebomos.cpp:634-843: dcosjik gradients, coordination forces,
    v_tally3) is the analytic gradient of its energy and is therefore not
    re-implemented at all.
  * The bond order b_ij = (p_ij + p_ji)/2 (pair_rebomos.cpp:845) never needs
    the reverse-edge value p_ji: summed over the full directed edge set,
    sum_e VA_e * (p_ij + p_ji)/2 == sum_e VA_e * p_ij  (the reverse-edge
    bijection re-indexes one half onto the other; VA and w are symmetric).
    So the energy is  E_REBO = 1/2 sum_edges [VR + p_ij * VA], and the
    half-list tag-parity trick (pair_rebomos.cpp:394-402) is unnecessary.
  * The per-step REBO sub-list rebuild (REBO_neigh, pair_rebomos.cpp:281-352)
    is replaced by a slack candidate list built at rebuild time: Sp(r) is
    identically 0 for r >= rcmax, so extra candidates contribute exactly
    zero energy and zero gradient.
  * Coordination numbers nM/nS are only ever needed for owned centers
    (p_ji is never evaluated), so no ghost-coordination pass exists.

Angular work is O(N*K^2) with K ~ 16 (the REBO list), not the 496-neighbor
master list; the LJ term is O(N*K_master).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..neighbor.neighbor import NeighborList, edge_components
from ..neighbor.build import NeighborData
from .base import PairStyle, register_pair_style
from .tables import REBOMoSTables, read_rebomos

TOL = 1.0e-9      # pair_rebomos.cpp:52


def lookup22(tab, ei, ej):
    """2x2 parameter table lookup as a where-chain.

    A fancy-index gather tab[ei, ej] on [N,K]-shaped indices costs ~450 ms
    per table at 36M edges on TPU (XLA general gather ~9 ns/index); the
    select chain costs ~6 ms.  Element indices are 0 (Mo) or 1 (S)."""
    return jnp.where(ei == 0,
                     jnp.where(ej == 0, tab[0, 0], tab[0, 1]),
                     jnp.where(ej == 0, tab[1, 0], tab[1, 1]))


def lookup2(tab, ei):
    """Per-element row select for [2, ...] coefficient tables."""
    shape = (ei.shape + (1,) * (tab.ndim - 1))
    return jnp.where(ei.reshape(shape) == 0, tab[0], tab[1])


def _poly6(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Horner evaluation of c0 + c1 x + ... + c6 x^6; coeffs [..., 7]."""
    out = coeffs[..., 6]
    for k in range(5, -1, -1):
        out = out * x + coeffs[..., k]
    return out


def sp_cutoff(r, rmin, rmax):
    """Cosine switching function Sp (pair_rebomos.h:195-211).

    C1-continuous, so autodiff matches the reference's analytic dX
    everywhere including the branch points (both give 0 there).
    """
    t = (r - rmin) / (rmax - rmin)
    tc = jnp.clip(t, 0.0, 1.0)
    mid = 0.5 * (1.0 + jnp.cos(tc * jnp.pi))
    return jnp.where(t <= 0.0, 1.0, jnp.where(t >= 1.0, 0.0, mid))


def g_spline(costh, b, bg):
    """Angular function g(cos theta) (pair_rebomos.h:68-167).

    b, bg: [...,7] coefficient rows already gathered per evaluation point.
    For costh in [0.5, 1] the two sixth-degree polynomials are blended by
    psi = (1 - cos(2 pi (costh - 1/2)))/2 (pair_rebomos.h:158-161).
    """
    gcos = _poly6(b, costh)
    gamma = _poly6(bg, costh)
    psi = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * (costh - 0.5)))
    blended = gcos + psi * (gamma - gcos)
    return jnp.where(costh >= 0.5, blended, gcos)


def p_coord(NM, NS, a):
    """Coordination penalty P(N) (pair_rebomos.h:173-179); a: [...,4]."""
    N = NM + NS
    return -a[..., 0] * (N - 1.0) - a[..., 1] * jnp.exp(-a[..., 2] * N) \
        + a[..., 3]


@register_pair_style("rebomos")
class REBOMoS(PairStyle):
    """pair_style rebomos — see module docstring."""

    def __init__(self, tables: REBOMoSTables, typemap, dtype=jnp.float64):
        """Args:
          tables: parsed MoS.REBO.set5b parameters.
          typemap: sequence mapping 1-based atom type -> element index
            (0=Mo, 1=S, -1=NULL), index 0 unused; from `pair_coeff * * file
            Mo S` (pair_rebomos.cpp:168-179).
        """
        self.tables = tables
        self.typemap_np = np.asarray(typemap, dtype=np.int32)
        self.dtype = dtype
        t = tables
        as_d = lambda v: jnp.asarray(v, dtype=dtype)
        self.rcmin = as_d(t.rcmin)
        self.rcmax = as_d(t.rcmax)
        self.Q = as_d(t.Q)
        self.alpha = as_d(t.alpha)
        self.A = as_d(t.A)
        self.BIJc = as_d(t.BIJc)
        self.Beta = as_d(t.Beta)
        self.b = as_d(t.b)
        self.bg = as_d(t.bg)
        self.a = as_d(t.a)
        self.sigma = as_d(t.sigma)
        self.epsilon = as_d(t.epsilon)
        self.rcLJmin = as_d(t.rcLJmin)
        self.rcLJmax = as_d(t.rcLJmax)
        self.lj1 = as_d(t.lj1)
        self.lj2 = as_d(t.lj2)
        self.lj3 = as_d(t.lj3)
        self.lj4 = as_d(t.lj4)
        self.typemap = jnp.asarray(self.typemap_np)
        from ..ops.lj_cells_pallas import derive_lj_constants
        from ..ops.rebo_pallas import derive_rebo_constants
        self._lj_consts = derive_lj_constants(t)
        self._rebo_consts = derive_rebo_constants(t)

    @classmethod
    def from_file(cls, path: str, elements, ntypes=None, dtype=jnp.float64):
        """elements: per atom type, 'Mo'/'M'/'S'/'NULL' (1-based order)."""
        ntypes = ntypes or len(elements)
        tmap = np.full(ntypes + 1, -1, dtype=np.int32)
        for i, el in enumerate(elements, start=1):
            if el in ("Mo", "M"):
                tmap[i] = 0
            elif el == "S":
                tmap[i] = 1
            elif el == "NULL":
                tmap[i] = -1
            else:
                raise ValueError(f"Unknown REBOMOS element {el!r}")
        return cls(read_rebomos(path), tmap, dtype=dtype)

    # -- neighbor requests -------------------------------------------------
    def neighbor_requests(self):
        t = self.tables
        ntypes = len(self.typemap_np) - 1
        el = self.typemap_np[1:]
        # master list must reach the largest interaction range: LJ rcLJmax
        # (the reference uses cut3rebo = 11.4 A which over-reaches; LJ range
        # 2.5 sigma <= 10.5 A is what the physics needs, pair_rebomos.cpp:518)
        master = np.zeros((ntypes + 1, ntypes + 1))
        rebo = np.zeros((ntypes + 1, ntypes + 1))
        for i in range(1, ntypes + 1):
            for j in range(1, ntypes + 1):
                ei, ej = el[i - 1], el[j - 1]
                if ei < 0 or ej < 0:
                    continue
                master[i, j] = t.rcLJmax[ei, ej]
                rebo[i, j] = t.rcmax[ei, ej]
        return {"master": master, "rebo": rebo}

    def ghost_margin(self, skin: float) -> float:
        """Halo width for sharding: the LJ reach (pairwise) or two REBO
        hops (bondorder of a halo center within rcmax of an owned atom
        needs that center's own rcmax neighborhood), whichever is larger.
        For set5b the LJ reach 2.5*sigma_MM = 10.46 A dominates."""
        t = self.tables
        rcmax = float(np.max(t.rcmax))
        ljmax = float(np.max(t.rcLJmax))
        return max(ljmax + skin, 2.0 * (rcmax + skin))

    def _jel(self, nlist, el_all):
        """Per-edge neighbor element: from the rebuild-time jtype cache via
        a short select chain (per-type), falling back to the el_all gather
        (one large-array gather per force evaluation otherwise)."""
        if nlist.jtype is None:
            return el_all[nlist.idx]
        out = jnp.zeros(nlist.jtype.shape, jnp.int32)
        for t in range(1, len(self.typemap_np)):
            out = jnp.where(nlist.jtype == t, int(self.typemap_np[t]), out)
        return out

    # -- energy ------------------------------------------------------------
    #: tiers the device rebuild should provide in gather-free cell form
    cell_tiers = ("master",)

    def energy(self, x, strain, types, nbr: NeighborData, h,
               center_mask=None):
        """center_mask: [N] bool marking true owned centers.  Under the
        sharded engine x carries halo atoms as pseudo-owned rows; their
        directed edges are owned (and summed) by another shard, so they
        are masked out of every tier here (each directed edge is counted
        by exactly one shard globally)."""
        ghosts = nbr.ghosts
        el_own = self.typemap[types]                      # [N]
        el_all = self.typemap[ghosts.all_types(types)]    # [N+Mg]

        rebo = nbr.lists["rebo"]
        if center_mask is not None:
            rebo = NeighborList(idx=rebo.idx,
                                mask=rebo.mask & center_mask[:, None],
                                jtype=rebo.jtype, mirror=rebo.mirror)
        e_rebo = self._rebo_energy(x, strain, el_own, el_all, ghosts,
                                   rebo, h)
        if "master" in nbr.lists:
            master = nbr.lists["master"]
            if center_mask is not None:
                master = NeighborList(
                    idx=master.idx,
                    mask=master.mask & center_mask[:, None],
                    jtype=master.jtype, mirror=master.mirror)
            e_lj = self._lj_energy(x, strain, el_own, el_all, ghosts,
                                   master, h)
        else:
            e_lj = self._lj_energy_cells(x, strain, ghosts, nbr.cells, h,
                                         center_mask=center_mask)
        return e_rebo + e_lj

    def _lj_energy_cells(self, x, strain, ghosts, cells, h,
                         center_mask=None):
        """Switched LJ over the dense cell decomposition.

        For each cell and each of its 14 half-offset neighbor cells
        (itself + the 13 lexicographically-positive offsets), a [C, C]
        block of pair interactions is evaluated as regular tensor
        arithmetic: the only gathers are the tiny cell-table lookups
        ([ncells*C] indices), not per-edge ones.  More pair evaluations
        than the [N, K] list, but at full VPU throughput instead of
        ~15 ns/gather-index.

        Pair accounting: each unordered candidate pair appears exactly
        once (the self-cell block holds both slot orderings, hence its
        extra 1/2), weighted by (owned_a + owned_b)/2 — the ownership sum
        reproduces the owned-center double-count convention of the [N, K]
        path, including pairs seen through periodic ghost images.
        """
        x_all = ghosts.all_positions(x, h)
        m_all = x_all.shape[0]
        # positions + element in cell layout (cheap gathers: ~ncells*C)
        xpad = jnp.concatenate(
            [x_all, jnp.full((1, 3), 1e7, x.dtype)], axis=0)
        cxs = [xpad[:, a][cells.table] for a in range(3)]  # 3 x [ncellsP, C]
        cel = jnp.zeros(cells.jtype.shape, jnp.int32)
        for t_ in range(1, len(self.typemap_np)):
            cel = jnp.where(cells.jtype == t_, int(self.typemap_np[t_]), cel)
        valid = cells.table < m_all
        if center_mask is None:
            ownedf = jnp.where(cells.table < cells.n_owned,
                               jnp.asarray(1.0, x.dtype), 0.0)
        else:
            # true-ownership vector (halo pseudo-owned rows excluded);
            # ghosts and the pad row carry 0
            own_pad = jnp.concatenate([
                center_mask.astype(x.dtype),
                jnp.zeros(m_all + 1 - center_mask.shape[0], x.dtype)])
            ownedf = own_pad[cells.table]

        ncells = cells.nbr_map.shape[0]
        noffs = cells.nbr_map.shape[1]
        # self-cell blocks contain both slot orderings of each pair
        scale = jnp.full((noffs,), 0.5, x.dtype).at[0].set(0.25)

        @jax.checkpoint
        def one_offset(e_acc, xs):
            nb_col, s = xs
            # neighbor-cell data ([ncells] row gather of [C] rows)
            bxs = [c[nb_col] for c in cxs]
            bel = cel[nb_col]
            bval = valid[nb_col]
            bid = cells.table[nb_col]
            bown = ownedf[nb_col]
            # center cells are the first ncells rows
            axs = [c[:ncells] for c in cxs]
            ael = cel[:ncells]
            aid = cells.table[:ncells]
            aval = valid[:ncells]
            aown = ownedf[:ncells]

            d = [bxs[a][:, None, :] - axs[a][:, :, None] for a in range(3)]
            if strain is not None:
                d = [d[a] + d[0] * strain[0, a] + d[1] * strain[1, a]
                     + d[2] * strain[2, a] for a in range(3)]
            rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            w = (aown[:, :, None] + bown[:, None, :]) * s
            pmask = (aval[:, :, None] & bval[:, None, :]
                     & (aid[:, :, None] != bid[:, None, :]))
            rsq = jnp.where(pmask, rsq, 1.0)
            r = jnp.sqrt(rsq)
            vlj = self._vlj(ael[:, :, None], bel[:, None, :], r, rsq)
            e_acc = e_acc + jnp.sum(jnp.where(pmask, w * vlj, 0.0))
            return e_acc, None

        # remat the per-offset body: without it, reverse-mode saves every
        # offset's [ncells, C, C] intermediates (GBs at 100k atoms)
        # carry seeded from x so its shard_map varying-axis type matches
        # the loop body's output (plain zeros are 'unvarying' under
        # shard_map and scan rejects the carry-type mismatch)
        e0 = jnp.zeros((), x.dtype) + 0.0 * x[0, 0]
        e, _ = jax.lax.scan(one_offset, e0, (cells.nbr_map.T, scale))
        return e

    # -- analytic forces (hot path) -----------------------------------------
    #: tiers for which the rebuild provides mirror-edge tables
    mirror_tiers = ("rebo",)

    def forces(self, x, types, nbr: NeighborData, h):
        """Forces with the LJ tier in closed form over the cell grid and
        the REBO tier scatter-free via the mirror-edge bijection.

        The REBO force math itself stays an autodiff vjp (its force
        machinery, pair_rebomos.cpp:634-843, is genuinely the chain rule
        through the bond order); only the edge-to-atom accumulation is
        hand-written.  The switched-LJ derivative is two lines of algebra,
        so writing it out replaces the forward+backward autodiff sweep
        over the cell blocks with a single force sweep."""
        if nbr.cells is None:
            return super().forces(x, types, nbr, h)
        ghosts = nbr.ghosts
        rebo = nbr.lists["rebo"]
        el_own = self.typemap[types]
        el_all = self.typemap[ghosts.all_types(types)]

        interp = self._pallas_interpret()
        if rebo.mirror is not None:
            f = self._rebo_forces_mirror(x, el_own, el_all, ghosts, rebo, h,
                                         interpret=interp)
        else:
            f = -jax.grad(lambda x_: self._rebo_energy(
                x_, None, el_own, el_all, ghosts, rebo, h))(x)
        if self._use_lj_pallas(x, nbr.cells):
            return f + self._lj_forces_pallas(x, ghosts, nbr.cells, h,
                                              interpret=interp)
        return f + self._lj_forces_cells(x, ghosts, nbr.cells, h)

    @staticmethod
    def _use_pallas(x) -> bool:
        """Pallas hot path: TPU backend, f32 only (override LPT_PALLAS;
        the value "interpret" additionally runs the kernels in Pallas
        interpret mode — the CPU-testable escape hatch that lets the
        suite exercise the production kernel dispatch, incl. inside
        shard_map)."""
        flag = os.environ.get("LPT_PALLAS")
        if flag is not None:
            return flag not in ("0", "off")
        return (x.dtype == jnp.float32
                and jax.default_backend() not in ("cpu",))

    @staticmethod
    def _pallas_interpret() -> bool:
        return os.environ.get("LPT_PALLAS") == "interpret"

    @classmethod
    def _use_lj_pallas(cls, x, cells) -> bool:
        return (cells is not None and cells.dims is not None
                and cls._use_pallas(x))

    def _cell_planes(self, x, ghosts, cells, h):
        """Packed [Dx, Dy, Dz, 8, C] planes for the Pallas cell kernel:
        rows 0-2 x/y/z (pad slots parked at 1e7), 3 element, 4 owned."""
        x_all = ghosts.all_positions(x, h)
        xpad = jnp.concatenate(
            [x_all, jnp.full((1, 3), 1e7, x.dtype)], axis=0)
        Dx, Dy, Dz = cells.dims
        C = cells.table.shape[1]
        ncells = Dx * Dy * Dz
        table = cells.table[:ncells]
        xyz = xpad[table].transpose(0, 2, 1)             # [ncells, 3, C]
        cel = jnp.zeros(table.shape, x.dtype)
        for t_ in range(1, len(self.typemap_np)):
            cel = jnp.where(cells.jtype[:ncells] == t_,
                            float(self.typemap_np[t_]), cel)
        owned = (table < cells.n_owned).astype(x.dtype)
        P = jnp.concatenate(
            [xyz, cel[:, None, :], owned[:, None, :],
             jnp.zeros((ncells, 3, C), x.dtype)], axis=1)
        return P.reshape(Dx, Dy, Dz, 8, C), table

    def _lj_forces_pallas(self, x, ghosts, cells, h, interpret=False):
        """Fused Pallas cell-pair LJ sweep (ops/lj_cells_pallas.py).

        Default: full 27-offset A-side enumeration — every ordered pair
        evaluated from the A side, so each program writes ONE resident
        output pencil (the Newton-half kernel set, LPT_LJ_HALF=1, halves
        the pair arithmetic but was measured SLOWER end-to-end: its
        B-side pencils multiply output DMA ~13x, 46.6 vs 36.3 ms/step at
        98k atoms).  Only the cell-table -> atom remap runs outside the
        kernel — a row gather via the rebuild-time inverse slot table."""
        from ..ops import lj_cells_pallas as ljp
        n = x.shape[0]
        P, table = self._cell_planes(x, ghosts, cells, h)
        Dx, Dy, Dz = cells.dims
        C = table.shape[1]
        (x0, x1), (y0, y1), (z0, z1) = cells.a_range
        if os.environ.get("LPT_LJ_HALF"):
            F3 = ljp.lj_cell_forces_half(P, self._lj_consts, cells.a_range,
                                         interpret=interpret)
        else:
            F = ljp.lj_cell_forces(P, self._lj_consts, cells.a_range,
                                   cells.cell_mn, cells.cell_size,
                                   interpret=interpret)
            F3 = F[..., 0:3, :].transpose(0, 1, 2, 4, 3)     # [...,C,3]
        if cells.aslot is not None:
            # rebuild-time inverse slot table: remap is a row gather
            return F3.reshape(-1, 3)[cells.aslot]
        ids = table.reshape(Dx, Dy, Dz, C)[x0:x1, y0:y1, z0:z1]
        return jnp.zeros((n, 3), x.dtype).at[ids.reshape(-1)].set(
            F3.reshape(-1, 3), mode="drop")

    def _lj_energy_pallas(self, x, ghosts, cells, h, interpret=False):
        """Total switched-LJ energy from the kernel's energy row."""
        from ..ops import lj_cells_pallas as ljp
        P, _ = self._cell_planes(x, ghosts, cells, h)
        F = ljp.lj_cell_forces(P, self._lj_consts, cells.a_range,
                               cells.cell_mn, cells.cell_size,
                               with_energy=True, interpret=interpret)
        return jnp.sum(F[..., 3, :])

    def _rebo_forces_mirror(self, x, el_own, el_all, ghosts, rebo, h,
                            force_pallas=None, interpret=False):
        """REBO forces without any per-edge scatter.

        The energy is a function of the edge displacement set {d_e}; its
        cotangent G_e = dE/dd_e comes from one vjp over pure [N,K] tensor
        math.  The chain rule to atoms is
            F_m = sum_k G[m,k] - sum_k G[mirror(m,k)]
        because every directed edge has a unique mirror (owner(j),
        image-of-i) among the owned rows — the rebuild-time `mirror`
        table turns the reverse accumulation (a 74 ms scatter-add at 98k
        atoms) into a row gather.  This is the TPU answer to newton-on
        reverse ghost communication (pair_aeam.cpp:257).

        The Pallas branch runs the whole pipeline in the kernel-native
        [K, Np] layout (atoms on lanes): the neighbor gather and the
        mirror gather are 2-D-index/2-D-output element gathers (the fast
        TPU gather class), and no [N,K,3] tensor or transpose copy ever
        exists.  Measured vs the [N,K]-layout flow at 98k atoms: the
        gather+transpose+mirror glue drops from ~21 ms to ~7 ms/step."""
        use_pallas = (self._use_pallas(x) if force_pallas is None
                      else force_pallas)
        if use_pallas:
            return self._rebo_forces_mirror_tn(x, el_own, el_all, ghosts,
                                               rebo, h, interpret=interpret)
        x_all = ghosts.all_positions(x, h)
        D = x_all[rebo.idx]                           # [N,K,3] row gather
        dx = D[..., 0] - x[:, 0][:, None]
        dy = D[..., 1] - x[:, 1][:, None]
        dz = D[..., 2] - x[:, 2][:, None]

        def e_of_d(dx_, dy_, dz_):
            rsq = dx_ * dx_ + dy_ * dy_ + dz_ * dz_
            rsq = jnp.where(rebo.mask, rsq, 1.0)
            return self._rebo_energy_core(dx_, dy_, dz_, rsq, rebo.mask,
                                          rebo, el_own, el_all)

        _, vjp = jax.vjp(e_of_d, dx, dy, dz)
        # cotangent seeded from x: under shard_map the output is
        # axis-varying and the vjp rejects an unvarying cotangent
        gx, gy, gz = vjp(jnp.ones((), x.dtype) + 0.0 * x[0, 0])
        from ..neighbor.neighbor import mirror_combine
        return mirror_combine(gx, gy, gz, rebo)

    def _rebo_forces_mirror_tn(self, x, el_own, el_all, ghosts, rebo, h,
                               interpret=False):
        """[K, Np]-layout REBO force path (see _rebo_forces_mirror).

        Everything derived from the neighbor list alone (idxT, jelT,
        mskT, mirror tables) is loop-invariant w.r.t. the scanned step,
        so XLA hoists it out of the segment while-loop; only the two
        fast-class gathers and the kernel run per step."""
        from ..ops.rebo_pallas import _rebo_call
        N, K = rebo.idx.shape
        Np = -(-N // 128) * 128
        dtype = x.dtype

        if rebo.idxT is not None:
            # rebuild-time transposed tables: nothing list-derived is
            # transposed (or re-laid-out) inside the step loop
            idxT = rebo.idxT
            mskT = rebo.maskT.astype(dtype)
            jelT = jnp.zeros(rebo.jtypeT.shape, dtype)
            for t in range(1, len(self.typemap_np)):
                jelT = jnp.where(rebo.jtypeT == t,
                                 dtype.type(self.typemap_np[t]), jelT)
            mirT = rebo.mirT
            mirvT = rebo.mirvT.astype(dtype)
        else:
            def padT(a, fill=0):
                return jnp.pad(jnp.swapaxes(a, 0, 1),
                               ((0, 0), (0, Np - N)), constant_values=fill)

            idxT = padT(rebo.idx)                      # [K, Np]
            mskT = padT(rebo.mask.astype(dtype))
            jelT = padT(self._jel(rebo, el_all).astype(dtype))
            # mirror slot (flat over [N,K] edges) -> flat over [K*Np]
            mir = rebo.mirror
            mir_ok = rebo.mask & (mir >= 0)
            mir_safe = jnp.maximum(mir, 0)
            mirT = padT(jnp.where(
                mir_ok, (mir_safe % K) * Np + mir_safe // K, 0))
            mirvT = padT(mir_ok.astype(dtype))
        eiT = jnp.pad(el_own.astype(dtype).reshape(1, N),
                      ((0, 7), (0, Np - N)))

        # Displacements via ONE transposed-OUTPUT row gather: out[c, e] =
        # x_all[idx[e], c] (offset_dims=(0,)).  Same fast row-gather class
        # as x_all[idx] (probe_mirror18: 6.6 vs 6.4 ms standalone at 2M
        # indices) but the output IS the [3, K, Np] plane layout the
        # kernel consumes — the row-form gather needed a [K, Np, 3] ->
        # planes relayout copy (1.33 ms/step at 98k atoms, profiled).
        # Per-component element gathers from 1-D columns are worse still
        # (flattened to a {0:T(1024)} scalar path, ~22 ms each).  The
        # center positions enter as 2-D [3, Np] row slices: 1-D [Np]
        # columns get a T(1024) layout whose broadcast against [K, Np]
        # cost ~1.6 ms of relayout copy per component per step (profiled).
        x_all = ghosts.all_positions(x, h)
        xT = jnp.pad(jnp.swapaxes(x, 0, 1), ((0, 0), (0, Np - N)))
        # LPT_DGT=t: transposed-OUTPUT displacement gather (planes
        # directly, no [K, Np, 3] -> planes relayout).  MEASURED DEAD END
        # in-step: standalone it matches the row gather (probe_mirror18)
        # and saves the 1.33 ms relayout, but the fused loop runs 26%
        # slower overall (2.30e6 vs 3.11e6 at-st/s) — in-loop, XLA fuses
        # the row gather + relayout with its neighbors better than the
        # standalone transposed gather.  Default stays on the row form.
        if os.environ.get("LPT_DGT") == "t":
            g3 = jax.lax.gather(
                x_all, idxT.reshape(-1, 1),
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(0,), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                slice_sizes=(1, 3), mode="clip").reshape(3, K, Np)
            dxT = g3[0] - xT[0:1, :]
            dyT = g3[1] - xT[1:2, :]
            dzT = g3[2] - xT[2:3, :]
        elif os.environ.get("LPT_DGT") == "self":
            # fold the center positions into the SAME row gather as the
            # neighbors (row K = identity), deleting the xT column
            # slices whose [Np] T(1024) VMEM prefetches showed as 2x3
            # per-step async copies in the trace.  MEASURED NEUTRAL
            # (3.19e6 vs 3.20e6 at-st/s at 98k): those copies overlap
            # compute and are not on the critical path.  Kept flag-gated.
            idn = jnp.minimum(jnp.arange(Np, dtype=idxT.dtype), N - 1)
            idxT1 = jnp.concatenate([idxT, idn[None, :]], axis=0)
            rows = x_all[idxT1.reshape(-1)].reshape(K + 1, Np, 3)
            dxT = rows[:K, :, 0] - rows[K:, :, 0]
            dyT = rows[:K, :, 1] - rows[K:, :, 1]
            dzT = rows[:K, :, 2] - rows[K:, :, 2]
        else:
            rows = x_all[idxT.reshape(-1)].reshape(K, Np, 3)
            dxT = rows[..., 0] - xT[0:1, :]
            dyT = rows[..., 1] - xT[1:2, :]
            dzT = rows[..., 2] - xT[2:3, :]

        consts_key = tuple(sorted(self._rebo_consts.items()))
        mir_mode = os.environ.get("LPT_MIR", "")
        if mir_mode == "" and rebo.mirT is not None and 3 * K <= 128 \
                and Np <= 262144 \
                and rebo.route is None and rebo.mirW is None:
            # Np cap: at ~1M atoms the [Np, Wr] table (512 MB) is far
            # above the gather-class cliff (~6.5 ns/idx) and the select
            # kernel scales with K*Wr — the element-gather combine wins
            # back there (monolayer accounting, ARCHITECTURE.md)
            mir_mode = "rowfetch"
        if mir_mode == "rowfetch":
            # ROW-FETCH combine (round-5 default): gather each edge's
            # whole mirror ROW (Wr-wide, the per-INDEX row-gather class:
            # 4.7 ms for 2M idx at 98k atoms, probe_evalboth — width-
            # insensitive 64->128) from a layout-pinned atom-major
            # [Np, Wr] table, then select the reverse-edge slot in an
            # opaque Pallas consumer.  Replaces the 10.1 + 1.3 ms
            # element-class mirror gather: the index count drops 3x
            # (rows vs elements) and the atom-major table transpose
            # costs ~1.1 ms.  jcol/lslot derive from the rebuild-time
            # mirT, so XLA hoists them out of the step loop.
            from ..ops.mirror_pallas import mirror_combine_rowfetch
            from ..ops.pin_rows import _pin_call
            gx, gy, gz = _rebo_call(dxT, dyT, dzT, jelT, mskT, eiT,
                                    consts_key=consts_key,
                                    interpret=interpret)
            Wr = 64 if 3 * K <= 64 else 128
            stacked = jnp.concatenate(
                [gx, gy, gz,
                 jnp.zeros((Wr - 3 * K, Np), dtype)], axis=0)
            grow = _pin_call(jnp.swapaxes(stacked, 0, 1),
                             interpret=interpret)        # [Np, Wr] pinned
            jcol = mirT % Np
            lslot = (mirT // Np).astype(dtype)
            rows2 = grow[jcol.reshape(-1)].reshape(K, Np, Wr)
            F8 = mirror_combine_rowfetch(gx, gy, gz, rows2, lslot, mirvT,
                                         interpret=interpret)
            return jnp.stack([F8[0], F8[1], F8[2]], axis=-1)[:N]
        if mir_mode == "pk":
            # Pallas-consumer combine: the kernel emits the interleaved
            # [K, Np, 4] cotangent table alongside the planes; the mirror
            # gather is ONE row gather (fast class, ~2.6 ms at 98k atoms
            # vs ~8.4 ms for the three element gathers of the default),
            # and the K-reduction that would re-fuse the gather into the
            # slow component-plane form (probe_mirror9-13) runs inside an
            # opaque Pallas combine kernel instead (ops/mirror_pallas.py).
            from ..ops.mirror_pallas import mirror_combine_rows
            gx, gy, gz, g4 = _rebo_call(
                dxT, dyT, dzT, jelT, mskT, eiT, consts_key=consts_key,
                interpret=interpret, emit_rows=True)
            gmir4 = g4.reshape(K * Np, 4)[mirT.reshape(-1)] \
                .reshape(K, Np, 4)
            frows = mirror_combine_rows(gx, gy, gz, gmir4, mirvT,
                                        interpret=interpret)
            return jnp.stack([frows[0], frows[1], frows[2]], axis=-1)[:N]
        if os.environ.get("LPT_MIR_ROWS"):
            # kernel emits interleaved [K, Np, 4] cotangent rows: the
            # mirror combine becomes ONE 4-wide row gather (fast
            # per-index class) instead of three element gathers over
            # component planes (profiled 10.1 ms vs 2.6 ms for the same
            # index count at 98k atoms)
            gx, gy, gz, g4 = _rebo_call(
                dxT, dyT, dzT, jelT, mskT, eiT, consts_key=consts_key,
                interpret=interpret, emit_rows=True)
            grows = g4.reshape(K * Np, 4)
            gmir = grows[mirT.reshape(-1)].reshape(K, Np, 4)[..., 0:3] \
                * mirvT[..., None]
        elif mir_mode == "atom" and rebo.mirror is not None:
            gx, gy, gz = _rebo_call(dxT, dyT, dzT, jelT, mskT, eiT,
                                    consts_key=consts_key,
                                    interpret=interpret)
            # ATOM-MAJOR table form (LPT_MIR=atom) — the index-locality
            # hypothesis.  Measured in-situ at 98k atoms: the gather
            # STAYS on the column-major {0,1:T(4,128)} table layout and
            # runs 10.1 ms/step (+ 1.3 ms swapaxes copy), WORSE than
            # the default (8.4 ms): index locality is not the lever,
            # the table layout is (see LPT_MIR=pin).
            GA = jnp.concatenate(
                [jnp.stack([gx, gy, gz], axis=-1)
                    .swapaxes(0, 1).reshape(Np * K, 3),
                 jnp.zeros((1, 3), dtype)], axis=0)
            ok = rebo.mask & (rebo.mirror >= 0)
            mirS = jnp.where(ok, rebo.mirror, Np * K).reshape(-1)
            gmir = GA[mirS].reshape(N, K, 3)
            fA = jnp.stack([jnp.sum(gx, axis=0), jnp.sum(gy, axis=0),
                            jnp.sum(gz, axis=0)], axis=-1)[:N]
            return fA - jnp.sum(gmir, axis=1)
        elif mir_mode == "pin2":
            gx, gy, gz = _rebo_call(dxT, dyT, dzT, jelT, mskT, eiT,
                                    consts_key=consts_key,
                                    interpret=interpret)
            # 2-D layout pin (LPT_MIR=pin2): reshape the stacked planes
            # to [K, Np*3] before the identity custom call, so the pin's
            # required row-major operand layout IS the interleaved table
            # order — one XLA transpose-copy + a full-lane streaming
            # copy, then the mirror gather runs in the fast row class.
            # MEASURED: 3.02e6 vs 3.64e6 default at 98k atoms — loses,
            # like every pin variant: the default gather fuses with its
            # producer, so any materialized interleave is a net cost.
            from ..ops.pin_rows import pin_rows3_v2
            grows = pin_rows3_v2(jnp.stack([gx, gy, gz], axis=-1),
                                 interpret=interpret)
            gmir = grows[mirT.reshape(-1)].reshape(K, Np, 3) \
                * mirvT[..., None]
        elif mir_mode == "pin":
            gx, gy, gz = _rebo_call(dxT, dyT, dzT, jelT, mskT, eiT,
                                    consts_key=consts_key,
                                    interpret=interpret)
            # Layout-pinned table (LPT_MIR=pin): route the stacked
            # cotangent table through a Pallas identity copy so XLA
            # must materialize it row-major; the mirror gather then
            # runs in the fast row-gather class (~0.43 ns/elem, the
            # D-gather's measured rate) instead of the column-major
            # element-gather class (~1.7 ns/elem).
            from ..ops.pin_rows import pin_rows3
            grows = pin_rows3(jnp.stack([gx, gy, gz], axis=-1),
                              interpret=interpret)
            gmir = grows[jnp.maximum(mirT, 0).reshape(-1)] \
                .reshape(K, Np, 3) * mirvT[..., None]
            gx_, gy_, gz_ = gx, gy, gz
            fx = jnp.sum(gx_, axis=0) - jnp.sum(gmir[..., 0], axis=0)
            fy = jnp.sum(gy_, axis=0) - jnp.sum(gmir[..., 1], axis=0)
            fz = jnp.sum(gz_, axis=0) - jnp.sum(gmir[..., 2], axis=0)
            return jnp.stack([fx, fy, fz], axis=-1)[:N]
        else:
            gx, gy, gz = _rebo_call(dxT, dyT, dzT, jelT, mskT, eiT,
                                    consts_key=consts_key,
                                    interpret=interpret)
            if rebo.route is not None:
                # block-sparse reaction kernel (ops/react_pallas.py):
                # the rebuild-time route tables turn the ~10 ms mirror
                # gather into dense VPU work over spatially-local blocks
                from ..ops.react_pallas import react_combine
                F = react_combine(gx, gy, gz, rebo.rblocks, rebo.rqoff,
                                  rebo.route, QR=rebo.react_qr,
                                  interpret=interpret)
                return F[:N]
            if rebo.mirW is not None:
                # windowed combine: per-chunk gathers from cyclic
                # sub-tables under the gather-class cliff
                return self._mirror_combine_windowed(gx, gy, gz, rebo, N)
            # Default: edge-order table + clamped gather + validity
            # multiply (the committed 8.4 ms/step form at 98k atoms).
            grows = jnp.stack([gx, gy, gz], axis=-1).reshape(K * Np, 3)
            gmir = grows[mirT.reshape(-1)].reshape(K, Np, 3) \
                * mirvT[..., None]
        fsum = jnp.sum(jnp.stack([gx, gy, gz], axis=-1), axis=0) \
            - jnp.sum(gmir, axis=0)                     # [Np, 3]
        return fsum[:N]

    @staticmethod
    def _mirror_combine_windowed(gx, gy, gz, rebo, N):
        """Chunked mirror combine over cyclic windows.

        The single-gather combine reads a [K*Np, 3] table whose physical
        size (512 B/row tiles) sits far above the TPU gather emitter's
        fast-class threshold (probe_mirror17: ~2x per-index cliff at
        ~190k rows).  With spatially-sorted atoms, every mirror partner
        of output chunk c lies within a cyclic column window measured at
        rebuild; gathering each chunk from its own [K*W(+1), 3] window
        (built by dynamic-slicing the cyclically padded planes) keeps
        every operand under the cliff (probe_mirror18: 6.9 vs 12.7 ms at
        2M indices).  Invalid edges carry the sentinel index K*W, which
        lands on the appended zero row — no validity multiply."""
        K, Np = gx.shape
        W = rebo.mirwin
        B = rebo.mirchunk
        nch = rebo.win0.shape[0]
        dtype = gx.dtype
        # cyclic pad: window [w0, w0+W) with w0 < Np always in range
        gxp = jnp.concatenate([gx, gx[:, :W]], axis=1)
        gyp = jnp.concatenate([gy, gy[:, :W]], axis=1)
        gzp = jnp.concatenate([gz, gz[:, :W]], axis=1)
        zrow = jnp.zeros((1, 3), dtype) + 0.0 * gx[0, 0]
        parts = []
        for ci in range(nch):
            c0 = ci * B
            Bc = min(B, Np - c0)
            w0 = rebo.win0[ci]
            z0 = jnp.zeros((), w0.dtype)
            wa = jax.lax.dynamic_slice(gxp, (z0, w0), (K, W))
            wb = jax.lax.dynamic_slice(gyp, (z0, w0), (K, W))
            wc = jax.lax.dynamic_slice(gzp, (z0, w0), (K, W))
            tab = jnp.concatenate(
                [jnp.stack([wa, wb, wc], -1).reshape(K * W, 3), zrow],
                axis=0)
            gm = tab[jax.lax.slice_in_dim(rebo.mirW, c0, c0 + Bc, axis=1)
                     .reshape(-1)].reshape(K, Bc, 3)
            own = jnp.stack(
                [jax.lax.slice_in_dim(g, c0, c0 + Bc, axis=1)
                 for g in (gx, gy, gz)], axis=-1)       # [K, Bc, 3]
            parts.append(jnp.sum(own - gm, axis=0))     # [Bc, 3]
        return jnp.concatenate(parts, axis=0)[:N]

    def _fpair_lj(self, ei, ej, r, rsq):
        """-(dV/dr)/r for the switched LJ (pair_rebomos.cpp:518-543):
        F_on_a = fpair * (x_a - x_b)."""
        sig = lookup22(self.sigma, ei, ej)
        eps = lookup22(self.epsilon, ei, ej)
        ljmin = lookup22(self.rcLJmin, ei, ej)
        ljmax = lookup22(self.rcLJmax, ei, ej)
        r2inv = 1.0 / rsq
        r6inv = r2inv * r2inv * r2inv
        # 12-6 regime: lj1 = 48 eps sig^12, lj2 = 24 eps sig^6
        f_126 = r6inv * (lookup22(self.lj1, ei, ej) * r6inv
                         - lookup22(self.lj2, ei, ej)) * r2inv
        # cubic ramp regime: V = dr^2 (c3 dr + c2), dV/dr = dr (3 c3 dr + 2 c2)
        drw = 0.95 * sig - ljmin
        r6c = (1.0 / 0.95) ** 6
        vdw = 4.0 * eps * r6c * (r6c - 1.0)
        dvdw = (-4.0 * eps / (0.95 * sig)) * r6c * (12.0 * r6c - 6.0)
        c2 = ((3.0 / drw) * vdw - dvdw) / drw
        c3 = (vdw / (drw * drw) - c2) / drw
        drp = r - ljmin
        f_ramp = -drp * (3.0 * c3 * drp + 2.0 * c2) / r
        return jnp.where((r > ljmax) | (r < ljmin), 0.0,
                         jnp.where(r >= 0.95 * sig, f_126, f_ramp))

    def _lj_forces_cells(self, x, ghosts, cells, h):
        """Closed-form LJ forces over the half-offset cell decomposition.

        Per slot pair with ownership weight w: F_a -= w*fpair*d,
        F_b += w*fpair*d (d = x_b - x_a, fpair = -(dV/dr)/r) — the exact
        gradient of the weighted energy in _lj_energy_cells.  The B-side
        accumulation needs no per-edge scatter: for a fixed offset, the
        neighbor cells are the nbr_map column — a per-CELL row scatter
        (~ncells indices).  Cell-table forces then map to atoms with one
        row scatter + a ghost-to-owner row scatter (the reverse-comm
        analogue, pair_aeam.cpp:257, as two cheap scatters)."""
        x_all = ghosts.all_positions(x, h)
        m_all = x_all.shape[0]
        n = x.shape[0]
        xpad = jnp.concatenate(
            [x_all, jnp.full((1, 3), 1e7, x.dtype)], axis=0)
        cxs = [xpad[:, a][cells.table] for a in range(3)]
        cel = jnp.zeros(cells.jtype.shape, jnp.int32)
        for t_ in range(1, len(self.typemap_np)):
            cel = jnp.where(cells.jtype == t_, int(self.typemap_np[t_]), cel)
        valid = cells.table < m_all
        ownedf = jnp.where(cells.table < cells.n_owned,
                           jnp.asarray(1.0, x.dtype), 0.0)
        ncells = cells.nbr_map.shape[0]
        ncellsP = cells.table.shape[0]
        C = cells.table.shape[1]
        noffs = cells.nbr_map.shape[1]
        scale = jnp.full((noffs,), 0.5, x.dtype).at[0].set(0.25)

        aval = valid[:ncells]
        aid = cells.table[:ncells]
        ael = cel[:ncells]
        aown = ownedf[:ncells]
        axs = [c[:ncells] for c in cxs]

        def one_offset(carry, xs):
            fa0, fa1, fa2, fb = carry
            nb_col, s = xs
            bxs = [c[nb_col] for c in cxs]
            bel = cel[nb_col]
            bval = valid[nb_col]
            bid = cells.table[nb_col]
            bown = ownedf[nb_col]

            d = [bxs[a][:, None, :] - axs[a][:, :, None] for a in range(3)]
            rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            w = (aown[:, :, None] + bown[:, None, :]) * s
            pmask = (aval[:, :, None] & bval[:, None, :]
                     & (aid[:, :, None] != bid[:, None, :]))
            rsq = jnp.where(pmask, rsq, 1.0)
            r = jnp.sqrt(rsq)
            fp = self._fpair_lj(ael[:, :, None], bel[:, None, :], r, rsq)
            fp = jnp.where(pmask, w * fp, 0.0)
            # F_a -= fp * d  (d points a -> b; fp > 0 is repulsive)
            fd = [fp * d[a] for a in range(3)]
            fa0 = fa0 - jnp.sum(fd[0], axis=2)
            fa1 = fa1 - jnp.sum(fd[1], axis=2)
            fa2 = fa2 - jnp.sum(fd[2], axis=2)
            # F_b += fp * d : neighbor cells of one offset are distinct
            # rows -> a ~ncells-row scatter, not a per-edge one
            fbcol = jnp.stack([jnp.sum(fd[a], axis=1) for a in range(3)],
                              axis=-1)                      # [ncells, C, 3]
            fb = fb.at[nb_col].add(fbcol, mode="drop")
            return (fa0, fa1, fa2, fb), None

        zseed = 0.0 * x[0, 0]
        z2 = jnp.zeros((ncells, C), x.dtype) + zseed
        fb0 = jnp.zeros((ncellsP, C, 3), x.dtype) + zseed
        (fa0, fa1, fa2, fb), _ = jax.lax.scan(
            one_offset, (z2, z2, z2, fb0), (cells.nbr_map.T, scale))
        ftab = fb.at[:ncells].add(jnp.stack([fa0, fa1, fa2], axis=-1))

        # cell table -> atoms (row scatter), then ghosts -> owners
        f_all = jnp.zeros((m_all + 1, 3), x.dtype).at[
            cells.table.reshape(-1)].add(ftab.reshape(-1, 3), mode="drop")
        f_own = f_all[:n]
        return f_own.at[ghosts.owner].add(f_all[n:m_all], mode="drop")

    def _rebo_energy(self, x, strain, el_own, el_all, ghosts, rebo, h):
        dx, dy, dz, rsq, mask = edge_components(x, ghosts, rebo, h, strain,
                                                row_gather=True)
        return self._rebo_energy_core(dx, dy, dz, rsq, mask, rebo,
                                      el_own, el_all)

    #: chunk the [N,K,K] angular tensors when they would exceed this many
    #: elements (512 MB f32 per tensor).  The XLA energy/vjp path
    #: materializes ~a dozen such tensors; unchunked, an 8M-atom sharded
    #: run needs >130 GB host RAM (observed OOM).  Small systems (all the
    #: f64 golden paths) stay single-shot: chunking changes summation
    #: order at the last-ulp level.
    _CHUNK_ELEMS = 128 * 1024 * 1024
    _CHUNK_ROWS = 16384

    def _rebo_energy_core(self, dx, dy, dz, rsq, mask, rebo, el_own, el_all):
        ei = jnp.broadcast_to(el_own[:, None], mask.shape)   # [N,K]
        ej = self._jel(rebo, el_all)
        N, K = mask.shape
        if N * K * K <= self._CHUNK_ELEMS:
            return self._rebo_energy_rows(dx, dy, dz, rsq, mask, ei, ej)
        # row-chunked + rematerialized: the energy is a sum of row-local
        # terms, so lax.map over row blocks bounds peak memory to one
        # block's tensors — for the forward AND (via jax.checkpoint) for
        # any vjp through this function (forces, strain virial)
        CH = self._CHUNK_ROWS
        nch = -(-N // CH)
        pad = nch * CH - N

        def padr(a, fill):
            return jnp.pad(a, ((0, pad), (0, 0)),
                           constant_values=fill).reshape(nch, CH, K)

        xs = (padr(dx, 0.0), padr(dy, 0.0), padr(dz, 0.0), padr(rsq, 1.0),
              padr(mask, False), padr(ei, 0), padr(ej, 0))

        @jax.checkpoint
        def body(args):
            return self._rebo_energy_rows(*args)

        return jnp.sum(jax.lax.map(body, xs))

    def _rebo_energy_rows(self, dx, dy, dz, rsq, mask, ei, ej):
        """Row-local REBO energy (every term depends only on its own row's
        edge data — the property the chunked path above relies on)."""
        r = jnp.sqrt(rsq)

        w = sp_cutoff(r, lookup22(self.rcmin, ei, ej),
                      lookup22(self.rcmax, ei, ej))
        w = jnp.where(mask, w, 0.0)

        # coordination numbers over the REBO shell (pair_rebomos.cpp:337-343)
        nM = jnp.sum(w * (ej == 0), axis=1)     # [N]
        nS = jnp.sum(w * (ej == 1), axis=1)

        # pair repulsion / attraction (pair_rebomos.cpp:418-427)
        Q = lookup22(self.Q, ei, ej)
        A = lookup22(self.A, ei, ej)
        alpha = lookup22(self.alpha, ei, ej)
        VR = w * (1.0 + Q / r) * A * jnp.exp(-alpha * r)
        VA = -w * lookup22(self.BIJc, ei, ej) \
            * jnp.exp(-lookup22(self.Beta, ei, ej) * r)

        # angular sum for p_ij: Etmp = sum_{k != j} w_ik g(cos theta_jik)
        # (pair_rebomos.cpp:607-629) — [N, K(j), K(k)], built from the
        # per-component edge arrays (no [N,K,3] tensor; see edge_components)
        dots = (dx[:, :, None] * dx[:, None, :]
                + dy[:, :, None] * dy[:, None, :]
                + dz[:, :, None] * dz[:, None, :])
        cos = dots / (r[:, :, None] * r[:, None, :])
        # Straight-through clamp to [-1, 1]: the reference clamps the value
        # (pair_rebomos.cpp:617-618) but still applies the full dcos/dr chain
        # in its force loop (cpp:648-665) — exact antipodal neighbor pairs
        # (cos = -1) exist in the perfect MoS2 lattice, so a plain clip would
        # zero gradients the reference keeps.
        cos = cos + jax.lax.stop_gradient(jnp.clip(cos, -1.0, 1.0) - cos)
        eI = ei[:, 0]                           # [N] center element
        bI = lookup2(self.b, eI)[:, None, None, :]       # [N,1,1,7]
        bgI = lookup2(self.bg, eI)[:, None, None, :]
        g = g_spline(cos, bI, bgI)              # [N,K,K]
        K = mask.shape[1]
        not_diag = ~jnp.eye(K, dtype=bool)[None, :, :]
        kmask = mask[:, None, :] & not_diag     # k valid, k != j (slot)
        Etmp = jnp.sum(jnp.where(kmask, w[:, None, :] * g, 0.0), axis=2)

        P = p_coord(nM, nS, lookup2(self.a, eI))         # [N]
        pij = jax.lax.rsqrt(1.0 + Etmp + P[:, None])

        live = mask & (w > TOL)                 # wij <= TOL skip, cpp:412
        e_edge = jnp.where(live, VR + pij * VA, 0.0)
        return 0.5 * jnp.sum(e_edge)

    def energy_peratom(self, x, types, nbr: NeighborData, h):
        """Per-atom energies (eatom) under ev_tally's half-half split.

        Totals match energy() exactly.  The per-atom partition of the bond
        order uses the directed p_ij (the symmetrized (p_ij+p_ji)/2 would
        need the reverse-edge gather); only the per-atom split differs from
        LAMMPS, by +/- VA*(p_ij-p_ji)/4 per edge — the sum is identical.
        """
        ghosts = nbr.ghosts
        rebo = nbr.lists["rebo"]
        master = nbr.lists.get("master")
        el_own = self.typemap[types]
        el_all = self.typemap[ghosts.all_types(types)]
        z = jnp.zeros((3, 3), x.dtype)
        n = x.shape[0]

        def scatter_half(per_edge, nlist):
            """0.5 to the center + 0.5 to the neighbor's owner."""
            eat = 0.5 * jnp.sum(per_edge, axis=1)
            owner_all = jnp.concatenate(
                [jnp.arange(n, dtype=ghosts.owner.dtype), ghosts.owner])
            j_owner = owner_all[nlist.idx]
            return eat.at[j_owner.reshape(-1)].add(
                0.5 * per_edge.reshape(-1))

        # REBO edges: recompute the per-edge energy pieces
        dx, dy, dz, rsq, mask = edge_components(x, ghosts, rebo, h, z, row_gather=True)
        r = jnp.sqrt(rsq)
        ei = el_own[:, None]
        ej = self._jel(rebo, el_all)
        w = jnp.where(mask, sp_cutoff(r, lookup22(self.rcmin, ei, ej),
                                      lookup22(self.rcmax, ei, ej)), 0.0)
        nM = jnp.sum(w * (ej == 0), axis=1)
        nS = jnp.sum(w * (ej == 1), axis=1)
        VR = w * (1.0 + lookup22(self.Q, ei, ej) / r) \
            * lookup22(self.A, ei, ej) \
            * jnp.exp(-lookup22(self.alpha, ei, ej) * r)
        VA = -w * lookup22(self.BIJc, ei, ej) \
            * jnp.exp(-lookup22(self.Beta, ei, ej) * r)
        dots = (dx[:, :, None] * dx[:, None, :]
                + dy[:, :, None] * dy[:, None, :]
                + dz[:, :, None] * dz[:, None, :])
        cos = jnp.clip(dots / (r[:, :, None] * r[:, None, :]), -1.0, 1.0)
        g = g_spline(cos, lookup2(self.b, el_own)[:, None, None, :],
                     lookup2(self.bg, el_own)[:, None, None, :])
        K = rebo.capacity
        kmask = mask[:, None, :] & ~jnp.eye(K, dtype=bool)[None]
        Etmp = jnp.sum(jnp.where(kmask, w[:, None, :] * g, 0.0), axis=2)
        P = p_coord(nM, nS, lookup2(self.a, el_own))
        pij = jax.lax.rsqrt(1.0 + Etmp + P[:, None])
        live = mask & (w > TOL)
        e_edge = jnp.where(live, 0.5 * (VR + pij * VA), 0.0)
        eat = scatter_half(e_edge, rebo)

        # LJ edges
        if master is not None:
            _, _, _, rsq, mask = edge_components(x, ghosts, master, h, z)
            r = jnp.sqrt(rsq)
            ej = self._jel(master, el_all)
            vlj = self._vlj(el_own[:, None], ej, r, rsq)
            eat = eat + scatter_half(jnp.where(mask, 0.5 * vlj, 0.0), master)
        else:
            eat = eat + self._lj_peratom_cells(x, ghosts, nbr.cells, h, n)
        return eat

    def virial_peratom(self, x, types, nbr: NeighborData, h):
        """Per-atom virial (vatom): REBO tier via the edge-cotangent
        decomposition, LJ tier via the master list (same) or the analytic
        per-pair cell sweep.  Σ_i vatom_i == energy_virial()'s W exactly
        (tested); per-atom split convention documented in
        edge_virial_peratom (v_tally3/v_tally2, pair_rebomos.cpp:710,725).
        """
        from .base import edge_virial_peratom
        ghosts = nbr.ghosts
        rebo = nbr.lists["rebo"]
        master = nbr.lists.get("master")
        el_own = self.typemap[types]
        el_all = self.typemap[ghosts.all_types(types)]
        n = x.shape[0]
        z = None
        dx, dy, dz, _, _ = edge_components(x, ghosts, rebo, h, z,
                                           row_gather=True)

        def e_rebo(dx_, dy_, dz_):
            rsq_ = jnp.where(rebo.mask, dx_ * dx_ + dy_ * dy_ + dz_ * dz_,
                             1.0)
            return self._rebo_energy_core(dx_, dy_, dz_, rsq_, rebo.mask,
                                          rebo, el_own, el_all)

        _, vjp = jax.vjp(e_rebo, dx, dy, dz)
        g = vjp(jnp.ones((), x.dtype))
        vat = edge_virial_peratom((dx, dy, dz), g, rebo, ghosts, n)

        if master is not None:
            dx, dy, dz, _, mask = edge_components(x, ghosts, master, h, z)
            ej = self._jel(master, el_all)

            def e_lj(dx_, dy_, dz_):
                rsq_ = jnp.where(mask, dx_ * dx_ + dy_ * dy_ + dz_ * dz_,
                                 1.0)
                vlj = self._vlj(el_own[:, None], ej, jnp.sqrt(rsq_), rsq_)
                return 0.5 * jnp.sum(jnp.where(mask, vlj, 0.0))

            _, vjp = jax.vjp(e_lj, dx, dy, dz)
            g = vjp(jnp.ones((), x.dtype))
            vat = vat + edge_virial_peratom((dx, dy, dz), g, master,
                                            ghosts, n)
        else:
            vat = vat + self._lj_virial_cells(x, ghosts, nbr.cells, h, n)
        return vat

    def _lj_virial_cells(self, x, ghosts, cells, h, n):
        """Per-atom LJ virial over the half-offset cell decomposition.

        Per unordered pair instance the tensor w·fpair·(d ⊗ d) (the exact
        strain derivative of that pair's energy term in _lj_energy_cells)
        is tallied with the same endpoint-ownership split as
        _lj_peratom_cells."""
        x_all = ghosts.all_positions(x, h)
        m_all = x_all.shape[0]
        xpad = jnp.concatenate([x_all, jnp.full((1, 3), 1e7, x.dtype)],
                               axis=0)
        cxs = [xpad[:, a][cells.table] for a in range(3)]
        cel = jnp.zeros(cells.jtype.shape, jnp.int32)
        for t_ in range(1, len(self.typemap_np)):
            cel = jnp.where(cells.jtype == t_, int(self.typemap_np[t_]), cel)
        valid = cells.table < m_all
        ownedf = jnp.where(cells.table < cells.n_owned,
                           jnp.asarray(1.0, x.dtype), 0.0)
        ncells = cells.nbr_map.shape[0]
        noffs = cells.nbr_map.shape[1]
        scale = jnp.full((noffs,), 0.5, x.dtype).at[0].set(0.25)
        aid = cells.table[:ncells]
        aval = valid[:ncells]
        a_tgt = jnp.where(aval, aid, 0)
        a_tgt = jnp.where(a_tgt < n, a_tgt, 0)

        @jax.checkpoint
        def one_offset(vat, xs):
            nb_col, s = xs
            bxs = [c[nb_col] for c in cxs]
            bel = cel[nb_col]
            bval = valid[nb_col]
            bid = cells.table[nb_col]
            bown = ownedf[nb_col]
            axs = [c[:ncells] for c in cxs]
            ael = cel[:ncells]
            aown = ownedf[:ncells]
            d = [bxs[a][:, None, :] - axs[a][:, :, None] for a in range(3)]
            rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            pmask = (aval[:, :, None] & bval[:, None, :]
                     & (aid[:, :, None] != bid[:, None, :]))
            rsq = jnp.where(pmask, rsq, 1.0)
            fp = jnp.where(pmask, self._fpair_lj(ael[:, :, None],
                                                 bel[:, None, :],
                                                 jnp.sqrt(rsq), rsq), 0.0)
            comps = (d[0] * d[0], d[1] * d[1], d[2] * d[2],
                     d[0] * d[1], d[0] * d[2], d[1] * d[2])
            b_tgt = jnp.where(bval & (bid < n), bid, 0)
            for ci, dd in enumerate(comps):
                t = fp * dd
                vat = vat.at[a_tgt.reshape(-1), ci].add(
                    jnp.sum(s * aown[:, :, None] * t, axis=2).reshape(-1))
                vat = vat.at[b_tgt.reshape(-1), ci].add(
                    jnp.sum(s * bown[:, None, :] * t, axis=1).reshape(-1))
            return vat, None

        vat, _ = jax.lax.scan(one_offset,
                              jnp.zeros((n, 6), x.dtype) + 0.0 * x[0, 0],
                              (cells.nbr_map.T, scale))
        return vat

    def _lj_peratom_cells(self, x, ghosts, cells, h, n):
        """Per-atom LJ from the half-offset cell decomposition (ev_tally
        half-half split: each unordered pair instance puts vlj/2 on each
        owned endpoint's owner; ghost endpoints collect their share from
        the mirror-image instance where they are owned)."""
        x_all = ghosts.all_positions(x, h)
        m_all = x_all.shape[0]
        xpad = jnp.concatenate([x_all, jnp.full((1, 3), 1e7, x.dtype)],
                               axis=0)
        cxs = [xpad[:, a][cells.table] for a in range(3)]
        cel = jnp.zeros(cells.jtype.shape, jnp.int32)
        for t_ in range(1, len(self.typemap_np)):
            cel = jnp.where(cells.jtype == t_, int(self.typemap_np[t_]), cel)
        valid = cells.table < m_all
        ownedf = jnp.where(cells.table < cells.n_owned,
                           jnp.asarray(1.0, x.dtype), 0.0)
        ncells = cells.nbr_map.shape[0]
        noffs = cells.nbr_map.shape[1]
        scale = jnp.full((noffs,), 0.5, x.dtype).at[0].set(0.25)
        aid = cells.table[:ncells]
        aval = valid[:ncells]
        a_tgt = jnp.where(aval, aid, 0)
        a_tgt = jnp.where(a_tgt < n, a_tgt, 0)     # ghost centers add 0

        @jax.checkpoint
        def one_offset(eat, xs):
            nb_col, s = xs
            bxs = [c[nb_col] for c in cxs]
            bel = cel[nb_col]
            bval = valid[nb_col]
            bid = cells.table[nb_col]
            bown = ownedf[nb_col]
            axs = [c[:ncells] for c in cxs]
            ael = cel[:ncells]
            aown = ownedf[:ncells]
            d = [bxs[a][:, None, :] - axs[a][:, :, None] for a in range(3)]
            rsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            pmask = (aval[:, :, None] & bval[:, None, :]
                     & (aid[:, :, None] != bid[:, None, :]))
            rsq = jnp.where(pmask, rsq, 1.0)
            vlj = jnp.where(pmask, self._vlj(ael[:, :, None],
                                             bel[:, None, :],
                                             jnp.sqrt(rsq), rsq), 0.0)
            # each endpoint's owner receives s * vlj if that endpoint is
            # owned (the ghost share lands via the mirror instance)
            ea = s * aown[:, :, None] * vlj
            eb = s * bown[:, None, :] * vlj
            eat = eat.at[a_tgt.reshape(-1)].add(
                jnp.sum(ea, axis=2).reshape(-1))
            b_tgt = jnp.where(bval & (bid < n), bid, 0)
            eat = eat.at[b_tgt.reshape(-1)].add(
                jnp.sum(eb, axis=1).reshape(-1))
            return eat, None

        eat, _ = jax.lax.scan(one_offset,
                              jnp.zeros(n, x.dtype) + 0.0 * x[0, 0],
                              (cells.nbr_map.T, scale))
        return eat

    def _vlj(self, ei, ej, r, rsq):
        sig = lookup22(self.sigma, ei, ej)
        eps = lookup22(self.epsilon, ei, ej)
        ljmin = lookup22(self.rcLJmin, ei, ej)
        ljmax = lookup22(self.rcLJmax, ei, ej)
        r2inv = 1.0 / rsq
        r6inv = r2inv * r2inv * r2inv
        v_126 = r6inv * (lookup22(self.lj3, ei, ej) * r6inv
                         - lookup22(self.lj4, ei, ej))
        drw = 0.95 * sig - ljmin
        r6c = (1.0 / 0.95) ** 6
        vdw = 4.0 * eps * r6c * (r6c - 1.0)
        dvdw = (-4.0 * eps / (0.95 * sig)) * r6c * (12.0 * r6c - 6.0)
        c2 = ((3.0 / drw) * vdw - dvdw) / drw
        c3 = (vdw / (drw * drw) - c2) / drw
        drp = r - ljmin
        v_ramp = drp * drp * (drp * c3 + c2)
        return jnp.where((r > ljmax) | (r < ljmin), 0.0,
                         jnp.where(r >= 0.95 * sig, v_126, v_ramp))

    def _lj_energy(self, x, strain, el_own, el_all, ghosts, master, h):
        """Three-regime switched LJ (pair_rebomos.cpp:518-543): zero outside
        [rcLJmin, rcLJmax], standard 12-6 above 0.95 sigma, cubic ramp with
        value+slope matched at 0.95 sigma below it."""
        _, _, _, rsq, mask = edge_components(x, ghosts, master, h, strain)
        r = jnp.sqrt(rsq)
        vlj = self._vlj(el_own[:, None], self._jel(master, el_all), r, rsq)
        return 0.5 * jnp.sum(jnp.where(mask, vlj, 0.0))
