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

import jax
import jax.numpy as jnp
import numpy as np

from ..neighbor.neighbor import edge_components
from ..neighbor.build import NeighborData
from .base import PairStyle, register_pair_style
from .tables import REBOMoSTables, read_rebomos

TOL = 1.0e-9      # pair_rebomos.cpp:52


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

    # -- energy ------------------------------------------------------------
    def energy(self, x, strain, types, nbr: NeighborData, h,
               center_mask=None):
        # all energy terms are per-edge and the list masks already restrict
        # centers, so center_mask needs no extra handling here
        del center_mask
        ghosts = nbr.ghosts
        el_own = self.typemap[types]                      # [N]
        el_all = self.typemap[ghosts.all_types(types)]    # [N+Mg]

        e_rebo = self._rebo_energy(x, strain, el_own, el_all, ghosts,
                                   nbr.lists["rebo"], h)
        e_lj = self._lj_energy(x, strain, el_own, el_all, ghosts,
                               nbr.lists["master"], h)
        return e_rebo + e_lj

    def _rebo_energy(self, x, strain, el_own, el_all, ghosts, rebo, h):
        dx, dy, dz, rsq, mask = edge_components(x, ghosts, rebo, h, strain)
        r = jnp.sqrt(rsq)
        ei = el_own[:, None]                    # [N,1]
        ej = el_all[rebo.idx]                   # [N,K]

        w = sp_cutoff(r, self.rcmin[ei, ej], self.rcmax[ei, ej])
        w = jnp.where(mask, w, 0.0)

        # coordination numbers over the REBO shell (pair_rebomos.cpp:337-343)
        nM = jnp.sum(w * (ej == 0), axis=1)     # [N]
        nS = jnp.sum(w * (ej == 1), axis=1)

        # pair repulsion / attraction (pair_rebomos.cpp:418-427)
        Q = self.Q[ei, ej]
        A = self.A[ei, ej]
        alpha = self.alpha[ei, ej]
        VR = w * (1.0 + Q / r) * A * jnp.exp(-alpha * r)
        VA = -w * self.BIJc[ei, ej] * jnp.exp(-self.Beta[ei, ej] * r)

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
        bI = self.b[el_own][:, None, None, :]   # [N,1,1,7]
        bgI = self.bg[el_own][:, None, None, :]
        g = g_spline(cos, bI, bgI)              # [N,K,K]
        K = rebo.capacity
        not_diag = ~jnp.eye(K, dtype=bool)[None, :, :]
        kmask = mask[:, None, :] & not_diag     # k valid, k != j (slot)
        Etmp = jnp.sum(jnp.where(kmask, w[:, None, :] * g, 0.0), axis=2)

        P = p_coord(nM, nS, self.a[el_own])     # [N]
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
        master = nbr.lists["master"]
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
        dx, dy, dz, rsq, mask = edge_components(x, ghosts, rebo, h, z)
        r = jnp.sqrt(rsq)
        ei = el_own[:, None]
        ej = el_all[rebo.idx]
        w = jnp.where(mask, sp_cutoff(r, self.rcmin[ei, ej],
                                      self.rcmax[ei, ej]), 0.0)
        nM = jnp.sum(w * (ej == 0), axis=1)
        nS = jnp.sum(w * (ej == 1), axis=1)
        VR = w * (1.0 + self.Q[ei, ej] / r) * self.A[ei, ej] \
            * jnp.exp(-self.alpha[ei, ej] * r)
        VA = -w * self.BIJc[ei, ej] * jnp.exp(-self.Beta[ei, ej] * r)
        dots = (dx[:, :, None] * dx[:, None, :]
                + dy[:, :, None] * dy[:, None, :]
                + dz[:, :, None] * dz[:, None, :])
        cos = jnp.clip(dots / (r[:, :, None] * r[:, None, :]), -1.0, 1.0)
        g = g_spline(cos, self.b[el_own][:, None, None, :],
                     self.bg[el_own][:, None, None, :])
        K = rebo.capacity
        kmask = mask[:, None, :] & ~jnp.eye(K, dtype=bool)[None]
        Etmp = jnp.sum(jnp.where(kmask, w[:, None, :] * g, 0.0), axis=2)
        P = p_coord(nM, nS, self.a[el_own])
        pij = jax.lax.rsqrt(1.0 + Etmp + P[:, None])
        live = mask & (w > TOL)
        e_edge = jnp.where(live, 0.5 * (VR + pij * VA), 0.0)
        eat = scatter_half(e_edge, rebo)

        # LJ edges
        _, _, _, rsq, mask = edge_components(x, ghosts, master, h, z)
        r = jnp.sqrt(rsq)
        ej = el_all[master.idx]
        vlj = self._vlj(el_own[:, None], ej, r, rsq)
        eat = eat + scatter_half(jnp.where(mask, 0.5 * vlj, 0.0), master)
        return eat

    def _vlj(self, ei, ej, r, rsq):
        sig = self.sigma[ei, ej]
        eps = self.epsilon[ei, ej]
        ljmin = self.rcLJmin[ei, ej]
        ljmax = self.rcLJmax[ei, ej]
        r2inv = 1.0 / rsq
        r6inv = r2inv * r2inv * r2inv
        v_126 = r6inv * (self.lj3[ei, ej] * r6inv - self.lj4[ei, ej])
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
        vlj = self._vlj(el_own[:, None], el_all[master.idx], r, rsq)
        return 0.5 * jnp.sum(jnp.where(mask, vlj, 0.0))
