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
Known deviation (documented): the reference's force pass applies the FULL
cut to the j-leg of angular triplets while its density pass used the reduced
cut (cpp:350 vs cpp:192), making its forces inconsistent with its energy for
angular-angular pairs in the 1.5 A shell — and order-dependent, since the
k-leg keeps the reduced cut.  We take forces = -grad(E) with the density-pass
cuts on both legs: energy-consistent, order-independent, and identical
whenever no angular-angular pair sits in the shell (e.g. dilute Si).

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

    def __init__(self, tables: AEAMTables, typemap, dtype=jnp.float64):
        self.tables = tables
        self.typemap_np = np.asarray(typemap, dtype=np.int32)
        self.dtype = dtype
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

    @classmethod
    def from_file(cls, path: str, elements, dtype=jnp.float64):
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
        return cls(t, tmap, dtype=dtype)

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
    def _rhor(self, ei, ej, r):
        """Density-contribution spline f_ij(r) (value; autodiff = f')."""
        tab = ei * self.nel + ej
        p_raw = r * self.rhor_rdr[tab] + 1.0
        n = self.rhor_nr[tab]
        m = jnp.minimum(jnp.floor(p_raw).astype(jnp.int32), n - 1)
        p = p_raw - m
        p = p + jax.lax.stop_gradient(jnp.minimum(p, 1.0) - p)
        c = self.rhor_spline[tab, m]
        return ((c[..., 3] * p + c[..., 4]) * p + c[..., 5]) * p + c[..., 6]

    def _phi(self, ei, ej, r):
        """Pair potential phi(r) from the z2r tables (stored unscaled)."""
        tab = self.z2r_map[ei, ej]
        p_raw = r * self.z2r_rdr[tab] + 1.0
        n = self.z2r_nr[tab]
        m = jnp.minimum(jnp.floor(p_raw).astype(jnp.int32), n - 1)
        p = p_raw - m
        p = p + jax.lax.stop_gradient(jnp.minimum(p, 1.0) - p)
        c = self.z2r_spline[tab, m]
        return ((c[..., 3] * p + c[..., 4]) * p + c[..., 5]) * p + c[..., 6]

    def _embed(self, ei, p_arg):
        """Embedding F(p) per element (clamp m to [1, n-1], cpp:286)."""
        n = self.frho_n[ei]
        m = jnp.clip(jnp.floor(p_arg).astype(jnp.int32), 1, n - 1)
        p = p_arg - m
        p = p + jax.lax.stop_gradient(jnp.minimum(p, 1.0) - p)
        c = self.frho_spline[ei, m]
        return ((c[..., 3] * p + c[..., 4]) * p + c[..., 5]) * p + c[..., 6]

    # ------------------------------------------------------------------
    def energy(self, x, strain, types, nbr: NeighborData, h,
               center_mask=None):
        ghosts = nbr.ghosts
        main = nbr.lists["main"]
        el_own = self.typemap[types]                   # [N]
        el_all = self.typemap[ghosts.all_types(types)]

        dx, dy, dz, rsq, mask = edge_components(x, ghosts, main, h, strain)
        r = jnp.sqrt(rsq)
        ei = el_own[:, None]
        ej = el_all[main.idx]

        ang_i = ei >= self.nnonangular                 # [N,1]
        ang_j = ej >= self.nnonangular                 # [N,K]
        cut_ij = self.cut[ei, ej]

        # density leg gating: cut - 1.5 when both endpoints angular
        # (pair_aeam.cpp:187-192, 218-223); note r > cut excludes (strict)
        leg_cut = cut_ij - jnp.where(ang_i & ang_j, CUTDEC, 0.0)
        in_leg = mask & (r <= leg_cut)

        f_ij = self._rhor(ei, ej, r)
        fw = jnp.where(in_leg, f_ij, 0.0)              # gated contribution

        # non-angular density: sum_j f_ij
        rho_lin = jnp.sum(fw, axis=1)

        # angular density: sum_{j<k} 2 f f (cos+1/3)^2
        #   == sum over ordered j != k of f f (cos+1/3)^2
        dots = (dx[:, :, None] * dx[:, None, :]
                + dy[:, :, None] * dy[:, None, :]
                + dz[:, :, None] * dz[:, None, :])
        cs = dots / (r[:, :, None] * r[:, None, :])
        ftet = (cs + 1.0 / 3.0) ** 2
        K = main.capacity
        not_diag = ~jnp.eye(K, dtype=bool)[None]
        pair_w = fw[:, :, None] * fw[:, None, :] * jnp.where(not_diag, 1.0, 0.0)
        rho_ang = jnp.sum(pair_w * ftet, axis=(1, 2))

        ang_center = el_own >= self.nnonangular        # [N]
        rho = jnp.where(ang_center, rho_ang, rho_lin)

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

        # pair term: full cut (cpp:350), half per directed edge (cpp:387)
        in_pair = mask & (r <= cut_ij)
        phi = self._phi(ei, ej, r)
        e_pair = 0.5 * jnp.sum(jnp.where(in_pair, phi, 0.0))

        return e_embed + e_pair

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
        dx, dy, dz, rsq, mask = edge_components(x, ghosts, main, h, z)
        r = jnp.sqrt(rsq)
        ei = el_own[:, None]
        ej = el_all[main.idx]
        ang_i = ei >= self.nnonangular
        ang_j = ej >= self.nnonangular
        cut_ij = self.cut[ei, ej]
        leg_cut = cut_ij - jnp.where(ang_i & ang_j, CUTDEC, 0.0)
        in_leg = mask & (r <= leg_cut)
        fw = jnp.where(in_leg, self._rhor(ei, ej, r), 0.0)
        rho_lin = jnp.sum(fw, axis=1)
        dots = (dx[:, :, None] * dx[:, None, :]
                + dy[:, :, None] * dy[:, None, :]
                + dz[:, :, None] * dz[:, None, :])
        cs = dots / (r[:, :, None] * r[:, None, :])
        ftet = (cs + 1.0 / 3.0) ** 2
        K = main.capacity
        nd = ~jnp.eye(K, dtype=bool)[None]
        rho_ang = jnp.sum(fw[:, :, None] * fw[:, None, :] * ftet
                          * jnp.where(nd, 1.0, 0.0), axis=(1, 2))
        ang_center = el_own >= self.nnonangular
        rho = jnp.where(ang_center, rho_ang, rho_lin)
        rho_pow = jnp.where(ang_center, jnp.sqrt(jnp.maximum(rho, 0.0)),
                            rho)
        p_arg = rho_pow * self.frho_rdrho[el_own] + 1.0
        embed = self._embed(el_own, p_arg)
        eat = jnp.where(ang_center, embed / 3.0, embed)
        phi = jnp.where(mask & (r <= cut_ij), self._phi(ei, ej, r), 0.0)
        return eat + 0.5 * jnp.sum(phi, axis=1)
