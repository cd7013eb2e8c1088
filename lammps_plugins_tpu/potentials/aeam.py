"""AEAM — angular embedded-atom method for Al-Si (TPU-native).

Physics from /root/reference/USER-AEAM/pair_aeam.cpp, re-designed TPU-first:
the reference's 3-pass compute (density accumulation -> reverse-comm ->
embedding -> forward-comm -> force distribution, pair_aeam.cpp:110-479)
collapses into ONE differentiable energy

    E = sum_i F_i( rho_i ^ n_i )  +  1/2 sum_directed_edges phi(r_ij)

with
    rho_i (non-angular) = sum_j f_ij                       (cpp:204-205)
    rho_i (angular)     = sum_{j<k} 2 f_ij f_ik (cos+1/3)^2 (cpp:249)
    n_i = 1 (non-angular) or 0.5 (angular)                  (cpp:274-282)

Forces are the autodiff gradient; both ghost reductions (reverse-comm of rho,
forward-comm of F') vanish because ghost positions are functions of owned
positions inside the energy.

Cutoff semantics replicated from the reference:
  * density legs use cut - 1.5 when BOTH endpoints are angular
    (CutDec, cpp:187-192 and cpp:218-223);
  * the pair term phi uses the full cut (cpp:350).
Force-pass inconsistency (quantified, see force_pass_deviation and
tests/test_aeam.py::test_force_pass_deviation_quantified): the reference's
force pass applies the FULL cut to the j-leg of angular triplets while its
density pass used the reduced cut (cpp:350 vs cpp:192) — and whether a
given shell pair contributes depends on its neighbor-list slot ORDER
(the k-loop keeps the reduced cut, cpp:398-421), so the reference force is
not implementation-independent there.  We take forces = -grad(E) with the
density-pass cuts on both legs (energy-consistent, order-independent).
For the shipped AlSi.aeam this is EXACTLY the reference's force: its Si-Si
density table is identically zero beyond r = cut - CutDec = 3.768 A (the
table itself encodes the reduced cutoff), so the full-cut lookup reads
exact zeros — the deviation bound is 0 for any configuration.

The embedding-argument guard minrho (cpp:329-332) is replicated with a
double-where so rho -> 0 gives exactly zero force without NaNs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..neighbor.neighbor import edge_components
from ..neighbor.build import NeighborData
from .base import PairStyle, register_pair_style
from .spline import make_spline
from .tables import AEAMTables, read_aeam

MINRHO = 1.0e-13      # pair_aeam.cpp:128
CUTDEC = 1.5          # pair_aeam.cpp:188


@register_pair_style("aeam")
class AEAM(PairStyle):
    """pair_style aeam — see module docstring."""

    def __init__(self, tables: AEAMTables, typemap, dtype=jnp.float64,
                 poly_mode: bool | None = None):
        self.tables = tables
        self.typemap_np = np.asarray(typemap, dtype=np.int32)
        self.dtype = dtype
        if poly_mode is None:
            import os
            poly_mode = os.environ.get("LPT_AEAM_POLY") == "1"
        self.poly_mode = bool(poly_mode)
        t = tables
        nel = t.nelements
        self.nel = nel
        self.nnonangular = t.nnonangular

        nrmax = int(t.nr.max())
        nrhomax = int(t.nrho.max())

        # rhor splines: one table per (i,j) element pair, stacked [nel*nel]
        rhor = np.zeros((nel * nel, nrmax + 1, 7))
        rhor_nr = np.zeros(nel * nel, np.int32)
        rhor_rdr = np.zeros(nel * nel)
        for i in range(nel):
            for j in range(nel):
                k = i * nel + j
                rhor[k, :t.nr[i, j] + 1] = make_spline(
                    t.rhor[i][j], int(t.nr[i, j]), float(t.dr[i, j]))
                rhor_nr[k] = t.nr[i, j]
                rhor_rdr[k] = 1.0 / t.dr[i, j]

        # z2r (= phi, unscaled — pair_aeam.cpp:369) lower-triangular tables
        nz2r = nel * (nel + 1) // 2
        z2r = np.zeros((nz2r, nrmax + 1, 7))
        z2r_nr = np.zeros(nz2r, np.int32)
        z2r_rdr = np.zeros(nz2r)
        z2r_map = np.zeros((nel, nel), np.int32)
        n = 0
        for i in range(nel):
            for j in range(i + 1):
                z2r[n, :t.nr[i, j] + 1] = make_spline(
                    t.z2r[(i, j)], int(t.nr[i, j]), float(t.dr[i, j]))
                z2r_nr[n] = t.nr[i, j]
                z2r_rdr[n] = 1.0 / t.dr[i, j]
                z2r_map[i, j] = n
                z2r_map[j, i] = n
                n += 1

        # frho splines per element
        frho = np.zeros((nel, nrhomax + 1, 7))
        frho_n = np.zeros(nel, np.int32)
        frho_rdrho = np.zeros(nel)
        for i in range(nel):
            frho[i, :t.nrho[i] + 1] = make_spline(
                t.frho[i], int(t.nrho[i]), float(t.drho[i]))
            frho_n[i] = t.nrho[i]
            frho_rdrho[i] = 1.0 / t.drho[i]

        as_d = lambda v: jnp.asarray(v, dtype=dtype)
        self.rhor_spline = as_d(rhor)
        self.rhor_nr = jnp.asarray(rhor_nr)
        self.rhor_rdr = as_d(rhor_rdr)
        self.z2r_spline = as_d(z2r)
        self.z2r_nr = jnp.asarray(z2r_nr)
        self.z2r_rdr = as_d(z2r_rdr)
        self.z2r_map = jnp.asarray(z2r_map)
        self.frho_spline = as_d(frho)
        self.frho_n = jnp.asarray(frho_n)
        self.frho_rdrho = as_d(frho_rdrho)
        self.cut = as_d(t.cut)
        self.typemap = jnp.asarray(self.typemap_np)
        # flat [T*(nr+1), 7] spline views + static per-table scalars so
        # per-edge lookups are single row gathers (2-index fancy gathers
        # and tiny-source element gathers hit TPU scalar paths)
        self.rhor_flat = self.rhor_spline.reshape(-1, 7)
        self.rhor_stride = nrmax + 1
        self.rhor_rdr_np = rhor_rdr
        self.rhor_nr_np = rhor_nr
        self.z2r_flat = self.z2r_spline.reshape(-1, 7)
        self.z2r_map_np = z2r_map
        self.z2r_rdr_np = z2r_rdr
        self.z2r_nr_np = z2r_nr
        self.cut_np = np.asarray(t.cut, np.float64)
        self._ang_sel = None
        # fused [rhor | z2r] rows: both tables are built on the (i,j)
        # pair's r grid (nr[i,j], dr[i,j]), so one 14-wide row gather
        # serves f_ij AND phi_ij — two separate [N,K,7] gathers cost
        # ~18 ms/step at 32k atoms, K=160
        pairrows = np.zeros((nel * nel, nrmax + 1, 14))
        for i in range(nel):
            for j in range(nel):
                k = i * nel + j
                pairrows[k, :, 0:7] = rhor[k]
                pairrows[k, :, 7:14] = z2r[z2r_map[i, j]]
        self.pair_flat = as_d(pairrows.reshape(-1, 14))
        # 21-wide rows for the fast force path: [rhor_ij | z2r | rhor_ji].
        # The reverse-direction density spline f'_ji rides the SAME row
        # gather (possible because the file's r-grids are per unordered
        # pair: dr[i,j] == dr[j,i]) — the TPU analogue of the reference's
        # fp forward communication (pair_aeam.cpp:307) costing zero extra
        # gathers.  Tile padding makes the extra columns free.
        self._sym_grids = bool(np.allclose(t.dr, t.dr.T)
                               and np.array_equal(t.nr, t.nr.T))
        if self._sym_grids:
            rows21 = np.zeros((nel * nel, nrmax + 1, 21))
            rows21[:, :, :14] = pairrows
            for i in range(nel):
                for j in range(nel):
                    rows21[i * nel + j, :, 14:21] = rhor[j * nel + i]
            self.pair_flat21 = as_d(rows21.reshape(-1, 21))
        self.poly = None
        if self.poly_mode and nel > 2:
            # _poly_pair_terms combines per-element-code tables bilinearly,
            # which is exact only for element codes in {0, 1}; a 3+-element
            # file would silently extrapolate clamped corner tables
            self.poly_mode = False
        if self.poly_mode and self._sym_grids:
            from .polyfit import fit_aeam_polys
            self.poly = fit_aeam_polys(t, rhor, z2r, z2r_map)
        elif self.poly_mode:
            self.poly_mode = False      # needs per-unordered-pair grids

    def prepare(self, types_np: np.ndarray) -> None:
        """Precompute the angular-center index set (static per system).

        The angular density is O(K^2) per center but only angular elements
        (e.g. 0.75% Si in sample.in) need it — the reference's k-loop runs
        only for angular centers (pair_aeam.cpp:208).  Compacting to the
        angular subset makes the [Na, K, K] tensor ~N/Na times smaller."""
        el = self.typemap_np[np.asarray(types_np)]
        sel = np.nonzero(el >= self.nnonangular)[0].astype(np.int32)
        if getattr(self, "_no_compact", False):
            # sharded view: global row indices are meaningless on local
            # blocks; only the degenerate no-angular-atoms compaction is
            # row-space independent (it keeps the fast paths)
            self._ang_sel = jnp.asarray(sel) if sel.size == 0 else None
            return
        # compaction pays only when angular atoms are a minority
        self._ang_sel = (jnp.asarray(sel)
                         if sel.size < 0.5 * len(types_np) else None)

    def for_sharded(self) -> "AEAM":
        """Sharded view: the global angular-row compaction (_ang_sel)
        indexes GLOBAL atom rows and cannot be used on per-shard local
        blocks — drop it, so the energy takes the masked full-K^2 angular
        branch and forces take exact autodiff (both row-space agnostic)."""
        import copy
        p = copy.copy(self)
        p._ang_sel = None
        p._no_compact = True
        return p

    @classmethod
    def from_file(cls, path: str, elements, dtype=jnp.float64,
                  poly_mode: bool | None = None):
        """elements: per 1-based atom type, names matching the file's element
        order (the reference enforces exact order, pair_aeam.cpp:568-572)."""
        t = read_aeam(path)
        tmap = np.full(len(elements) + 1, -1, dtype=np.int32)
        for i, el in enumerate(elements, start=1):
            if el == "NULL":
                continue
            if el not in t.elements:
                raise ValueError(
                    f"No matching element {el!r} in AEAM file "
                    f"(has {t.elements})")
            tmap[i] = t.elements.index(el)
        return cls(t, tmap, dtype=dtype, poly_mode=poly_mode)

    @property
    def masses(self):
        """Per-type masses from the file (pair_aeam.cpp:588 set_mass)."""
        out = [0.0]
        for i in range(1, len(self.typemap_np)):
            el = self.typemap_np[i]
            out.append(float(self.tables.mass[el]) if el >= 0 else 0.0)
        return np.asarray(out)

    def neighbor_requests(self):
        ntypes = len(self.typemap_np) - 1
        cut = np.zeros((ntypes + 1, ntypes + 1))
        for i in range(1, ntypes + 1):
            for j in range(1, ntypes + 1):
                ei, ej = self.typemap_np[i], self.typemap_np[j]
                if ei >= 0 and ej >= 0:
                    cut[i, j] = self.tables.cut[ei, ej]
        return {"main": cut}

    # ------------------------------------------------------------------
    def _sel_tab(self, tab, values):
        """Per-edge scalar from static per-table values via a select chain
        (a gather from a [T]-sized source costs ~25 ms at 5M edges)."""
        out = jnp.zeros(tab.shape, self.dtype) + float(values[0])
        for t_ in range(1, len(values)):
            out = jnp.where(tab == t_, float(values[t_]), out)
        return out

    def _jel(self, nlist, el_all):
        """Per-edge neighbor element from the rebuild-time jtype cache."""
        if nlist.jtype is None:
            return el_all[nlist.idx]
        out = jnp.zeros(nlist.jtype.shape, jnp.int32)
        for t_ in range(1, len(self.typemap_np)):
            out = jnp.where(nlist.jtype == t_, int(self.typemap_np[t_]), out)
        return out

    def _spline_eval(self, flat, stride, tab, rdr_np, nr_np, arg):
        """Cubic spline value at arg: one [.., 7] row gather per point."""
        p_raw = arg * self._sel_tab(tab, rdr_np) + 1.0
        n = self._sel_tab(tab, nr_np).astype(jnp.int32)
        m = jnp.minimum(jnp.floor(p_raw).astype(jnp.int32), n - 1)
        p = p_raw - m
        p = p + jax.lax.stop_gradient(jnp.minimum(p, 1.0) - p)
        c = flat[tab * stride + m]                       # row gather
        return ((c[..., 3] * p + c[..., 4]) * p + c[..., 5]) * p + c[..., 6]

    def _rhor(self, ei, ej, r):
        """Density-contribution spline f_ij(r) (value; autodiff = f')."""
        tab = jnp.broadcast_to(ei * self.nel + ej, r.shape)
        return self._spline_eval(self.rhor_flat, self.rhor_stride, tab,
                                 self.rhor_rdr_np, self.rhor_nr_np, r)

    def _phi(self, ei, ej, r):
        """Pair potential phi(r) from the z2r tables (stored unscaled)."""
        pairtab = jnp.broadcast_to(ei * self.nel + ej, r.shape)
        tab = self._sel_tab(pairtab, self.z2r_map_np.reshape(-1)
                            ).astype(jnp.int32)
        return self._spline_eval(self.z2r_flat, self.rhor_stride, tab,
                                 self.z2r_rdr_np, self.z2r_nr_np, r)

    def _cut_ij(self, ei, ej, shape):
        pairtab = jnp.broadcast_to(ei * self.nel + ej, shape)
        return self._sel_tab(pairtab, self.cut_np.reshape(-1))

    def _embed(self, ei, p_arg):
        """Embedding F(p) per element (clamp m to [1, n-1], cpp:286)."""
        n = self.frho_n[ei]
        m = jnp.clip(jnp.floor(p_arg).astype(jnp.int32), 1, n - 1)
        p = p_arg - m
        p = p + jax.lax.stop_gradient(jnp.minimum(p, 1.0) - p)
        c = self.frho_spline[ei, m]
        return ((c[..., 3] * p + c[..., 4]) * p + c[..., 5]) * p + c[..., 6]

    # ------------------------------------------------------------------
    def _rho_field(self, x, strain, el_own, el_all, ghosts, main, h):
        dx, dy, dz, rsq, mask = edge_components(x, ghosts, main, h, strain,
                                                row_gather=True)
        return self._rho_core(dx, dy, dz, rsq, mask, el_own, el_all, main)

    def _rho_core(self, dx, dy, dz, rsq, mask, el_own, el_all, main):
        """Density rho_i plus the per-edge quantities shared by both tally
        paths.  The O(K^2) angular density runs over the compacted angular
        subset when prepare() found one (pair_aeam.cpp:208 — the k-loop
        only runs for angular centers)."""
        r = jnp.sqrt(rsq)
        ei = el_own[:, None]
        ej = self._jel(main, el_all)

        ang_i = ei >= self.nnonangular                 # [N,1]
        ang_j = ej >= self.nnonangular                 # [N,K]
        cut_ij = self._cut_ij(ei, ej, r.shape)

        # density leg gating: cut - 1.5 when both endpoints angular
        # (pair_aeam.cpp:187-192, 218-223); note r > cut excludes (strict)
        leg_cut = cut_ij - jnp.where(ang_i & ang_j, CUTDEC, 0.0)
        in_leg = mask & (r <= leg_cut)
        # one fused 14-wide row gather serves f_ij (rho spline) AND phi
        tab = jnp.broadcast_to(ei * self.nel + ej, r.shape)
        p_raw = r * self._sel_tab(tab, self.rhor_rdr_np) + 1.0
        nknot = self._sel_tab(tab, self.rhor_nr_np).astype(jnp.int32)
        m = jnp.minimum(jnp.floor(p_raw).astype(jnp.int32), nknot - 1)
        p = p_raw - m
        p = p + jax.lax.stop_gradient(jnp.minimum(p, 1.0) - p)
        c = self.pair_flat[tab * self.rhor_stride + m]       # [N, K, 14]
        f_ij = ((c[..., 3] * p + c[..., 4]) * p + c[..., 5]) * p + c[..., 6]
        phi = ((c[..., 10] * p + c[..., 11]) * p + c[..., 12]) * p \
            + c[..., 13]
        fw = jnp.where(in_leg, f_ij, 0.0)
        rho_lin = jnp.sum(fw, axis=1)
        ang_center = el_own >= self.nnonangular        # [N]
        K = main.capacity
        not_diag = ~jnp.eye(K, dtype=bool)[None]

        def rho_ang_block(fwB, dxB, dyB, dzB, rB):
            # sum_{j<k} 2 f f (cos+1/3)^2 == ordered sum over j != k
            dots = (dxB[:, :, None] * dxB[:, None, :]
                    + dyB[:, :, None] * dyB[:, None, :]
                    + dzB[:, :, None] * dzB[:, None, :])
            cs = dots / (rB[:, :, None] * rB[:, None, :])
            ftet = (cs + 1.0 / 3.0) ** 2
            pw = fwB[:, :, None] * fwB[:, None, :] \
                * jnp.where(not_diag, 1.0, 0.0)
            return jnp.sum(pw * ftet, axis=(1, 2))

        sel = self._ang_sel
        if sel is not None and sel.shape[0] == 0:
            rho = rho_lin
        elif sel is not None:
            rho_ang_s = rho_ang_block(fw[sel], dx[sel], dy[sel], dz[sel],
                                      r[sel])
            rho = rho_lin.at[sel].set(rho_ang_s)
        else:
            rho = jnp.where(ang_center,
                            rho_ang_block(fw, dx, dy, dz, r), rho_lin)
        return rho, ang_center, r, mask, phi, cut_ij

    def energy(self, x, strain, types, nbr: NeighborData, h,
               center_mask=None):
        ghosts = nbr.ghosts
        main = nbr.lists["main"]
        el_own = self.typemap[types]                   # [N]
        el_all = self.typemap[ghosts.all_types(types)]
        rho_etc = self._rho_field(x, strain, el_own, el_all, ghosts, main, h)
        return self._energy_from_rho(rho_etc, el_own, center_mask)

    def _energy_core(self, dx, dy, dz, rsq, mask, el_own, el_all, main):
        """Scalar energy from the per-edge displacement set (used by the
        mirror-edge force path: grad w.r.t. (dx, dy, dz))."""
        rho_etc = self._rho_core(dx, dy, dz, rsq, mask, el_own, el_all, main)
        return self._energy_from_rho(rho_etc, el_own, None)

    def _energy_from_rho(self, rho_etc, el_own, center_mask):
        rho, ang_center, r, mask, phi, cut_ij = rho_etc
        # embedding argument rho^n with the minrho force guard
        # (pair_aeam.cpp:329-332): value uses rho^n always, gradient is cut
        # below minrho — double-where keeps sqrt'(0) out of the backward pass
        live = rho > MINRHO
        rho_safe = jnp.where(live, rho, 1.0)
        pow_live = jnp.where(ang_center, jnp.sqrt(rho_safe), rho_safe)
        pow_dead = jax.lax.stop_gradient(
            jnp.where(ang_center, jnp.sqrt(jnp.where(live, 1.0, rho)),
                      rho))
        rho_pow = jnp.where(live, pow_live, pow_dead)

        p_arg = rho_pow * self.frho_rdrho[el_own] + 1.0
        embed = self._embed(el_own, p_arg)
        if center_mask is not None:
            embed = jnp.where(center_mask, embed, 0.0)
        e_embed = jnp.sum(embed)

        # pair term: full cut (cpp:350), half per directed edge (cpp:387).
        # Under sharding only owned-centered directed edges count (the
        # reverse direction is owned by the neighbor shard).
        in_pair = mask & (r <= cut_ij)
        if center_mask is not None:
            in_pair = in_pair & center_mask[:, None]
        e_pair = 0.5 * jnp.sum(jnp.where(in_pair, phi, 0.0))

        return e_embed + e_pair

    @property
    def mirror_tiers(self):
        """Mirror-edge table only when the force path actually uses it.

        With symmetric r-grids the fast force path computes the newton
        reaction locally (21-wide spline rows + the F'_j row gather) and
        never touches the mirror table — but building it dominates the
        rebuild (~117 of 233 ms at 32k atoms, K=176: an [E,3] pack gather
        plus an [N,K,K] reverse-slot search), so request it only for the
        asymmetric-grid fallback."""
        return () if getattr(self, "_sym_grids", False) else ("main",)

    def forces(self, x, types, nbr: NeighborData, h):
        """Forces without per-edge mirror gathers (the fast path) when the
        file's r-grids are symmetric; mirror-bijection autodiff otherwise.

        The fast path exploits that for NON-angular centers the edge
        cotangent is radial, G_e = s_e * d_e, so the newton reaction of
        edge (j, i) onto i is computable AT edge (i, j) from purely local
        data: s_mir = F'_j f'_ji(r) + phi'(r)/2 — the reference's fp
        forward-comm (pair_aeam.cpp:307) turned into one packed row
        gather.  This removed the [N*K, 3] mirror gather that was 70% of
        the AEAM step (125 of 170 ms at 32k atoms, K=256).  Angular
        centers (the compacted Si subset) keep exact autodiff cotangents;
        their newton reaction is a small scatter."""
        main = nbr.lists["main"]
        if self._sym_grids:
            return self._forces_fast(x, types, nbr, h)
        if main.mirror is None:
            return super().forces(x, types, nbr, h)
        from ..neighbor.neighbor import mirror_combine
        ghosts = nbr.ghosts
        el_own = self.typemap[types]
        el_all = self.typemap[ghosts.all_types(types)]
        x_all = ghosts.all_positions(x, h)
        D = x_all[main.idx]                           # [N,K,3] row gather
        dx = D[..., 0] - x[:, 0][:, None]
        dy = D[..., 1] - x[:, 1][:, None]
        dz = D[..., 2] - x[:, 2][:, None]

        def e_of_d(dx_, dy_, dz_):
            rsq = dx_ * dx_ + dy_ * dy_ + dz_ * dz_
            rsq = jnp.where(main.mask, rsq, 1.0)
            return self._energy_core(dx_, dy_, dz_, rsq, main.mask,
                                     el_own, el_all, main)

        _, vjp = jax.vjp(e_of_d, dx, dy, dz)
        gx, gy, gz = vjp(jnp.ones((), x.dtype) + 0.0 * x[0, 0])
        return mirror_combine(gx, gy, gz, main)

    def virial_peratom(self, x, types, nbr: NeighborData, h):
        """Per-atom virial (vatom) via the edge-cotangent decomposition
        over the main list — the density, embedding, angular, and pair
        terms all enter through the edge displacement set, so one vjp
        covers the whole ev_tally/ev_tally3 family (pair_aeam.cpp:393,472).
        Σ_i vatom_i == the global strain-derivative virial exactly."""
        from .base import edge_virial_peratom
        ghosts = nbr.ghosts
        main = nbr.lists["main"]
        el_own = self.typemap[types]
        el_all = self.typemap[ghosts.all_types(types)]
        n = x.shape[0]
        dx, dy, dz, _, _ = edge_components(x, ghosts, main, h, None,
                                           row_gather=True)

        def e_of_d(dx_, dy_, dz_):
            rsq = jnp.where(main.mask, dx_ * dx_ + dy_ * dy_ + dz_ * dz_,
                            1.0)
            return self._energy_core(dx_, dy_, dz_, rsq, main.mask,
                                     el_own, el_all, main)

        _, vjp = jax.vjp(e_of_d, dx, dy, dz)
        g = vjp(jnp.ones((), x.dtype))
        return edge_virial_peratom((dx, dy, dz), g, main, ghosts, n)

    # -- gather-free piecewise-polynomial pair terms (poly_mode) ----------
    def _poly_chain(self, code, shape, coefs):
        """Per-edge power-basis coefficients via a select chain over the
        (table, segment) code.  All coefficients are compile-time scalars:
        no table gather, pure VPU selects (the same reasoning as _sel_tab —
        gathers from tiny sources hit the TPU scalar path)."""
        cs = []
        ncode = coefs.shape[0]
        for k in range(coefs.shape[1]):
            col = coefs[:, k]
            out = jnp.full(shape, float(col[0]), self.dtype)
            for cidx in range(1, ncode):
                out = jnp.where(code == cidx, float(col[cidx]), out)
            cs.append(out)
        return cs

    def _poly_pair_terms(self, ei, ej, r, cut_ij):
        """(f_ij, f'_ij, f'_ji, phi'_ij) per edge from the piecewise
        Chebyshev refits (see polyfit.py for the fidelity statement).
        Replaces the fused 21-wide spline-row gather of the exact path.

        Coefficient selection is two-level: one 7-deep segment-select
        chain per type-pair CORNER, then an exact bilinear combine over
        the element codes (the LJ-kernel constant trick) — the corner
        chains are shared between the (ei,ej) and (ej,ei) directions, so
        this costs ~30% fewer selects than the flat 32-code chain it
        replaces (the chains were ~1.2k VPU ops per edge, the single
        hottest item of the AEAM step at K=176)."""
        from .polyfit import U0, NSEG, DEG
        assert self.nel <= 2, \
            "poly_mode bilinear combine requires element codes in {0, 1}"
        inv_cut = 1.0 / cut_ij
        u = r * inv_cut
        t = (u - U0) * (NSEG / (1.0 - U0))
        t = jnp.clip(t, 0.0, NSEG * (1.0 - 1e-6))
        seg = jnp.floor(t).astype(jnp.int32)
        v = 2.0 * (t - seg) - 1.0
        dv_dr = (2.0 * NSEG / (1.0 - U0)) * inv_cut
        nel = self.nel
        fco = np.asarray(self.poly.f_coef).reshape(nel, nel, NSEG, DEG + 1)
        pco = np.asarray(self.poly.phi_coef).reshape(nel, nel, NSEG,
                                                     DEG + 1)
        eif = ei.astype(self.dtype)
        ejf = ej.astype(self.dtype)
        eijf = eif * ejf

        def seg_chain(col):
            """Per-edge scalar from a [NSEG] column via a select chain."""
            out = jnp.full(r.shape, float(col[0]), self.dtype)
            for s_ in range(1, NSEG):
                out = jnp.where(seg == s_, float(col[s_]), out)
            return out

        def corner_coeffs(tab, k):
            """(c00, c10-c00, c01-c00, c11-c10-c01+c00) per-edge scalars
            for coefficient k (bilinear deltas precomputed in numpy)."""
            c00 = tab[0, 0, :, k]
            d10 = tab[min(1, nel - 1), 0, :, k] - c00
            d01 = tab[0, min(1, nel - 1), :, k] - c00
            d11 = (tab[min(1, nel - 1), min(1, nel - 1), :, k]
                   - tab[min(1, nel - 1), 0, :, k]
                   - tab[0, min(1, nel - 1), :, k] + c00)
            return (seg_chain(c00), seg_chain(d10), seg_chain(d01),
                    seg_chain(d11))

        def horner_pair(tab, want_val, want_rev):
            """Horner in v for (ei,ej) [+ derivative] and optionally the
            (ej,ei) derivative, sharing the corner chains."""
            val = der = der_r = None
            for k in range(DEG, -1, -1):
                c00, d10, d01, d11 = corner_coeffs(tab, k)
                cf = c00 + d10 * eif + d01 * ejf + d11 * eijf
                if want_val:
                    val = cf if val is None else val * v + cf
                if der is None:
                    if k > 0:
                        der = DEG * cf
                elif k > 0:
                    der = der * v + k * cf
                if want_rev:
                    cr = c00 + d10 * ejf + d01 * eif + d11 * eijf
                    if der_r is None:
                        if k > 0:
                            der_r = DEG * cr
                    elif k > 0:
                        der_r = der_r * v + k * cr
            return (val, None if der is None else der * dv_dr,
                    None if der_r is None else der_r * dv_dr)

        f_ij, fp_ij, fp_ji = horner_pair(fco, True, True)
        _, phip, _ = horner_pair(pco, False, False)
        return f_ij, fp_ij, fp_ji, phip

    def _embed_deriv(self, ei, p_arg):
        """dF/drho from the derivative coefficient rows (cpp:940 fp)."""
        n = self.frho_n[ei]
        m = jnp.clip(jnp.floor(p_arg).astype(jnp.int32), 1, n - 1)
        p = jnp.minimum(p_arg - m, 1.0)
        c = self.frho_spline[ei, m]
        return (c[..., 0] * p + c[..., 1]) * p + c[..., 2]

    def _forces_fast(self, x, types, nbr: NeighborData, h):
        """See forces().  Gather budget: positions [M,3], spline rows
        [.,21], F'_j [M,3] — three row gathers, no mirror, no scatter
        except the tiny angular subset."""
        ghosts = nbr.ghosts
        main = nbr.lists["main"]
        idx, mask = main.idx, main.mask
        el_own = self.typemap[types]
        el_all = self.typemap[ghosts.all_types(types)]
        n = x.shape[0]

        x_all = ghosts.all_positions(x, h)
        D = x_all[idx]                                # [N,K,3] row gather
        dx = D[..., 0] - x[:, 0][:, None]
        dy = D[..., 1] - x[:, 1][:, None]
        dz = D[..., 2] - x[:, 2][:, None]
        rsq = jnp.where(mask, dx * dx + dy * dy + dz * dz, 1.0)
        r = jnp.sqrt(rsq)

        ei = el_own[:, None]
        ej = self._jel(main, el_all)
        ang_i = ei >= self.nnonangular
        ang_j = ej >= self.nnonangular
        ang_center = el_own >= self.nnonangular
        cut_ij = self._cut_ij(ei, ej, r.shape)
        leg_cut = cut_ij - jnp.where(ang_i & ang_j, CUTDEC, 0.0)
        in_leg = mask & (r <= leg_cut)
        in_pair = mask & (r <= cut_ij)

        if self.poly is not None:
            f_ij, fp_ij, fp_ji, phip = self._poly_pair_terms(ei, ej, r,
                                                             cut_ij)
        else:
            tab = jnp.broadcast_to(ei * self.nel + ej, r.shape)
            p_raw = r * self._sel_tab(tab, self.rhor_rdr_np) + 1.0
            nknot = self._sel_tab(tab, self.rhor_nr_np).astype(jnp.int32)
            m = jnp.minimum(jnp.floor(p_raw).astype(jnp.int32), nknot - 1)
            p = jnp.minimum(p_raw - m, 1.0)
            c = self.pair_flat21[tab * self.rhor_stride + m]   # [N,K,21]
            f_ij = ((c[..., 3] * p + c[..., 4]) * p + c[..., 5]) * p \
                + c[..., 6]
            fp_ij = (c[..., 0] * p + c[..., 1]) * p + c[..., 2]
            phip = (c[..., 7] * p + c[..., 8]) * p + c[..., 9]
            fp_ji = (c[..., 14] * p + c[..., 15]) * p + c[..., 16]

        # density field (linear everywhere; angular subset replaces below)
        fw = jnp.where(in_leg, f_ij, 0.0)
        rho = jnp.sum(fw, axis=1)
        sel = self._ang_sel
        if sel is not None and sel.shape[0] > 0:
            dots = (dx[sel][:, :, None] * dx[sel][:, None, :]
                    + dy[sel][:, :, None] * dy[sel][:, None, :]
                    + dz[sel][:, :, None] * dz[sel][:, None, :])
            cs = dots / (r[sel][:, :, None] * r[sel][:, None, :])
            K = main.capacity
            nd = ~jnp.eye(K, dtype=bool)[None]
            pw = fw[sel][:, :, None] * fw[sel][:, None, :] \
                * jnp.where(nd, 1.0, 0.0)
            rho = rho.at[sel].set(jnp.sum(pw * (cs + 1.0 / 3.0) ** 2,
                                          axis=(1, 2)))
        elif sel is None:
            # no compaction (majority angular): fall back to autodiff
            return PairStyle.forces(self, x, types, nbr, h)

        # embedding derivative F'(rho) with the minrho guard (cpp:329-332)
        live = rho > MINRHO
        rho_safe = jnp.where(live, rho, 1.0)
        rho_pow = jnp.where(ang_center, jnp.sqrt(rho_safe), rho_safe)
        p_arg = rho_pow * self.frho_rdrho[el_own] + 1.0
        Fp = self._embed_deriv(el_own, p_arg)
        # linear-center chain only; angular centers are exact via the
        # subset vjp below (their sqrt/minrho chain included there)
        Fp_lin = jnp.where(live & ~ang_center, Fp, 0.0)   # [N]

        # F'_j per edge: packed [M, 3] row gather (fp forward-comm)
        fp3 = jnp.stack([jnp.concatenate([Fp_lin, Fp_lin[ghosts.owner]]),
                         jnp.zeros(x_all.shape[0], x.dtype),
                         jnp.zeros(x_all.shape[0], x.dtype)], axis=1)
        Fp_j = fp3[idx][..., 0]                            # [N,K]

        s_own = Fp_lin[:, None] * jnp.where(in_leg, fp_ij, 0.0)
        s_mir = Fp_j * jnp.where(in_leg, fp_ji, 0.0)
        s_pair = jnp.where(in_pair, phip, 0.0)
        s = jnp.where(mask, (s_own + s_mir + s_pair) / r, 0.0)
        fx = jnp.sum(s * dx, axis=1)
        fy = jnp.sum(s * dy, axis=1)
        fz = jnp.sum(s * dz, axis=1)
        force = jnp.stack([fx, fy, fz], axis=1)

        if sel is not None and sel.shape[0] > 0:
            # angular centers: exact cotangents of the angular embedding
            # energy on the compacted subset + scatter reaction
            idxB = idx[sel]
            maskB = mask[sel]
            in_legB = in_leg[sel]
            f_ijB = f_ij[sel]
            fp_ijB = fp_ij[sel]
            el_sel = el_own[sel]

            def e_ang(dxB, dyB, dzB):
                rsqB = jnp.where(maskB, dxB ** 2 + dyB ** 2 + dzB ** 2, 1.0)
                rB = jnp.sqrt(rsqB)
                # f(r) re-linearized around the gathered rows: value +
                # derivative * (rB - r) keeps the row gather out of the
                # vjp while matching the spline's local slope exactly
                fB = jnp.where(in_legB,
                               f_ijB + fp_ijB * (rB - r[sel]), 0.0)
                dots = (dxB[:, :, None] * dxB[:, None, :]
                        + dyB[:, :, None] * dyB[:, None, :]
                        + dzB[:, :, None] * dzB[:, None, :])
                cs = dots / (rB[:, :, None] * rB[:, None, :])
                K = main.capacity
                nd = ~jnp.eye(K, dtype=bool)[None]
                pw = fB[:, :, None] * fB[:, None, :] \
                    * jnp.where(nd, 1.0, 0.0)
                rhoB = jnp.sum(pw * (cs + 1.0 / 3.0) ** 2, axis=(1, 2))
                liveB = rhoB > MINRHO
                rhoB_safe = jnp.where(liveB, rhoB, 1.0)
                pow_live = jnp.sqrt(rhoB_safe)
                pow_dead = jax.lax.stop_gradient(
                    jnp.sqrt(jnp.where(liveB, 1.0, jnp.maximum(rhoB, 0.0))))
                rho_powB = jnp.where(liveB, pow_live, pow_dead)
                p_argB = rho_powB * self.frho_rdrho[el_sel] + 1.0
                return jnp.sum(self._embed(el_sel, p_argB))

            _, vjp = jax.vjp(e_ang, dx[sel], dy[sel], dz[sel])
            gxB, gyB, gzB = vjp(jnp.ones((), x.dtype) + 0.0 * x[0, 0])
            force = force.at[sel].add(
                jnp.stack([jnp.sum(gxB, 1), jnp.sum(gyB, 1),
                           jnp.sum(gzB, 1)], axis=1))
            # newton reaction onto the (possibly ghost) targets
            gB = jnp.stack([gxB, gyB, gzB], axis=-1)       # [Na,K,3]
            m_all = x_all.shape[0]
            tgt = jnp.where(maskB, idxB, m_all)
            sc = jnp.zeros((m_all + 1, 3), x.dtype).at[
                tgt.reshape(-1)].add(-gB.reshape(-1, 3), mode="drop")
            force = force + sc[:n]
            force = force.at[ghosts.owner].add(sc[n:m_all], mode="drop")
        return force

    def force_pass_deviation(self, x, types, nbr: NeighborData, h):
        """Per-atom bound on |F_reference − F_here| from the reference's
        force-pass cutoff inconsistency (pair_aeam.cpp:350 vs :192).

        The reference's density pass zeroes the j-leg of angular triplets
        when both endpoints are angular and r1 > cut − 1.5 (CutDec), but
        its force pass evaluates the triplet with the FULL-cut f_ij there
        — and whether a given shell pair contributes at all depends on its
        slot ORDER in the neighbor list (the k-loop applies CutDec to the
        k leg, so a shell leg appearing later than its partner is skipped,
        cpp:398-421).  The reference force is therefore not reproducible
        implementation-independently; this returns the [N, 3] sum of ALL
        possible shell-triplet force terms — an upper bound on the
        deviation of ANY ordering (ours corresponds to zero such terms:
        the energy-consistent gradient).  Zero whenever no angular-angular
        pair sits in the 1.5 A shell (e.g. dilute Si as in sample.in)."""
        ghosts = nbr.ghosts
        main = nbr.lists["main"]
        el_own = self.typemap[types]
        el_all = self.typemap[ghosts.all_types(types)]
        n = x.shape[0]
        m_all = x.shape[0] + ghosts.count

        dx, dy, dz, rsq, mask = edge_components(x, ghosts, main, h, None,
                                                row_gather=True)
        r = jnp.sqrt(rsq)
        ei = el_own[:, None]
        ej = self._jel(main, el_all)
        ang_i = ei >= self.nnonangular
        ang_j = ej >= self.nnonangular
        cut_ij = self._cut_ij(ei, ej, r.shape)
        # shell legs: both ends angular, r in (cut-1.5, cut]
        shell = mask & ang_i & ang_j & (r > cut_ij - CUTDEC) \
            & (r <= cut_ij)
        # normal legs (density-pass gating)
        leg_cut = cut_ij - jnp.where(ang_i & ang_j, CUTDEC, 0.0)
        in_leg = mask & (r <= leg_cut)

        # rho/fp exactly as the energy uses them
        rho, ang_center, _, _, _, _ = self._rho_core(
            dx, dy, dz, rsq, mask, el_own, el_all, main)
        live = rho > MINRHO
        rho_safe = jnp.where(live, rho, 1.0)
        p_arg = jnp.sqrt(rho_safe) * self.frho_rdrho[el_own] + 1.0
        fp = self._embed_deriv(el_own, p_arg)
        Fptmp = jnp.where(live & ang_center,
                          0.5 / jnp.sqrt(rho_safe), 0.0)       # ni=0.5
        pref_i = Fptmp * fp                                    # [N]

        # spline values/derivs at the shell legs (full cut) and normal legs
        f_ij = self._rhor(ei, ej, r)
        tab = jnp.broadcast_to(ei * self.nel + ej, r.shape)
        p_raw = r * self._sel_tab(tab, self.rhor_rdr_np) + 1.0
        nknot = self._sel_tab(tab, self.rhor_nr_np).astype(jnp.int32)
        mm = jnp.minimum(jnp.floor(p_raw).astype(jnp.int32), nknot - 1)
        pp = jnp.minimum(p_raw - mm, 1.0)
        cc = self.rhor_flat[tab * self.rhor_stride + mm]
        df_ij = (cc[..., 0] * pp + cc[..., 1]) * pp + cc[..., 2]

        # vectorized over angular centers only (analysis path: runs eager,
        # so the compaction can use concrete numpy indices)
        ang_rows = jnp.asarray(np.nonzero(
            np.asarray(el_own) >= self.nnonangular)[0].astype(np.int32))
        if ang_rows.shape[0] == 0:
            return jnp.zeros((n, 3), x.dtype)

        dxB, dyB, dzB = dx[ang_rows], dy[ang_rows], dz[ang_rows]
        rB = r[ang_rows]
        shellB = shell[ang_rows]
        legB = in_leg[ang_rows]
        fB = jnp.where(legB, f_ij[ang_rows], 0.0)
        dfB = df_ij[ang_rows]
        f_fullB = f_ij[ang_rows]
        prefB = pref_i[ang_rows]
        idxB = main.idx[ang_rows]

        # triplet tensors [Na, K(j=shell), K(k=normal)]
        r1 = rB[:, :, None]
        r2 = rB[:, None, :]
        dots = (dxB[:, :, None] * dxB[:, None, :]
                + dyB[:, :, None] * dyB[:, None, :]
                + dzB[:, :, None] * dzB[:, None, :])
        cs = dots / (r1 * r2)
        rsq3 = r1 ** 2 + r2 ** 2 - 2.0 * dots
        r3 = jnp.sqrt(jnp.maximum(rsq3, 1e-12))
        delcs = cs + 1.0 / 3.0
        ftet = delcs * delcs
        pair_ok = shellB[:, :, None] & legB[:, None, :]
        ci = 2.0
        fik = fB[:, None, :]
        dfik_t = dfB[:, None, :]
        fij_t = f_fullB[:, :, None]
        dfij_t = dfB[:, :, None]
        DFij = ci * (fik * dfij_t * ftet + fij_t * fik * 2.0 * delcs
                     * (1.0 / r2 - cs / r1))
        DFik = ci * (fij_t * dfik_t * ftet + fij_t * fik * 2.0 * delcs
                     * (1.0 / r1 - cs / r2))
        DFjk = ci * fij_t * fik * 2.0 * delcs * (-r3 / (r1 * r2))
        w = jnp.where(pair_ok, prefB[:, None, None], 0.0)
        FFij = -w * DFij / r1
        FFik = -w * DFik / r2
        FFjk = -w * DFjk / r3
        d1 = jnp.stack([dxB, dyB, dzB], axis=-1)
        d3 = d1[:, None, :, :] - d1[:, :, None, :]      # x_k - x_j
        fj = FFij[..., None] * d1[:, :, None, :] - FFjk[..., None] * d3
        fk = FFik[..., None] * d1[:, None, :, :] + FFjk[..., None] * d3

        out = jnp.zeros((m_all + 1, 3), x.dtype)
        out = out.at[ang_rows].add(-jnp.sum(fj + fk, axis=(1, 2)))
        tgt_j = jnp.where(shellB, idxB, m_all)
        out = out.at[tgt_j.reshape(-1)].add(
            jnp.sum(fj, axis=2).reshape(-1, 3), mode="drop")
        tgt_k = jnp.where(legB, idxB, m_all)
        out = out.at[tgt_k.reshape(-1)].add(
            jnp.sum(fk, axis=1).reshape(-1, 3), mode="drop")
        # ghost contributions to owners
        res = out[:n].at[ghosts.owner].add(out[n:m_all], mode="drop")
        return res

    def energy_peratom(self, x, types, nbr: NeighborData, h):
        """Per-atom energies exactly as the reference tallies them:
        embedding F to each center with the 1/3 factor for angular atoms
        (pair_aeam.cpp:296-301), and 0.5*phi per directed edge to the
        CENTER only (cpp:389 adds to eatom[i], not j)."""
        ghosts = nbr.ghosts
        main = nbr.lists["main"]
        el_own = self.typemap[types]
        el_all = self.typemap[ghosts.all_types(types)]
        z = jnp.zeros((3, 3), x.dtype)
        rho, ang_center, r, mask, phi, cut_ij = self._rho_field(
            x, z, el_own, el_all, ghosts, main, h)
        rho_pow = jnp.where(ang_center, jnp.sqrt(jnp.maximum(rho, 0.0)),
                            rho)
        p_arg = rho_pow * self.frho_rdrho[el_own] + 1.0
        embed = self._embed(el_own, p_arg)
        eat = jnp.where(ang_center, embed / 3.0, embed)
        phi = jnp.where(mask & (r <= cut_ij), phi, 0.0)
        return eat + 0.5 * jnp.sum(phi, axis=1)
