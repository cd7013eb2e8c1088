"""pair_style lj/cut and lj/cut/coul/cut — 12-6 LJ (+ truncated Coulomb).

These are host-LAMMPS pair styles (not part of the reference plugin set)
that the validation configs require: BASELINE.json config 2 is a
"charged-ion LJ/Coulomb melt + fix bfield" — fix bfield acts on charges,
so the framework needs an interacting charged system to drive it through.
Semantics follow LAMMPS pair_lj_cut.cpp / pair_lj_cut_coul_cut.cpp:

  * E_lj   = 4 eps [ (sig/r)^12 - (sig/r)^6 ],  r < cut_lj (unshifted —
    LAMMPS default pair_modify shift no; truncation is exact at r = cut
    even though neighbor lists carry skin slack)
  * E_coul = qqr2e * q_i q_j / r,               r < cut_coul
  * unset type pairs mix geometrically: eps_ij = sqrt(eps_i eps_j),
    sig_ij = sqrt(sig_i sig_j) (LAMMPS default mix for lj/cut)

TPU form: one [N, K] masked edge sweep over the master list; per-edge
type-pair coefficients come from a flat-index gather (tab[ti*T+tj] with
2-D index/output shapes — the fast gather class; 2-D fancy indexing
tab[ti, tj] is ~100x slower, see ops/ notes).  Forces are autodiff
gradients; the virial is the strain derivative (potentials/base.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..neighbor.build import NeighborData
from ..neighbor.neighbor import edge_components
from .base import PairStyle, register_pair_style


@register_pair_style("lj/cut")
class PairLJCut(PairStyle):
    name = "lj/cut"

    def __init__(self, cutoff: float, ntypes: int = 1, dtype=jnp.float64):
        self.cut_global = float(cutoff)
        self.ntypes = int(ntypes)
        self.dtype = dtype
        T = self.ntypes + 1
        self._eps = np.zeros((T, T))
        self._sig = np.zeros((T, T))
        self._cut = np.full((T, T), self.cut_global)
        self._isset = np.zeros((T, T), bool)
        self._tabs = None

    # -- coefficients ------------------------------------------------------
    def set_coeff(self, i: int, j: int, eps: float, sigma: float,
                  cut: float | None = None) -> None:
        """pair_coeff i j eps sigma [cut] (symmetric)."""
        for a, b in ((i, j), (j, i)):
            self._eps[a, b] = eps
            self._sig[a, b] = sigma
            self._cut[a, b] = self.cut_global if cut is None else float(cut)
            self._isset[a, b] = True
        self._tabs = None

    def _mix(self) -> None:
        """Geometric mixing for unset off-diagonal pairs (LAMMPS
        Pair::mix_energy/mix_distance with mix_flag GEOMETRIC, the lj/cut
        default)."""
        T = self.ntypes + 1
        for i in range(1, T):
            for j in range(i + 1, T):
                if self._isset[i, j]:
                    continue
                if not (self._isset[i, i] and self._isset[j, j]):
                    raise ValueError(
                        f"pair_coeff missing for type pair {i} {j} "
                        "and no i-i/j-j coefficients to mix from")
                eps = np.sqrt(self._eps[i, i] * self._eps[j, j])
                sig = np.sqrt(self._sig[i, i] * self._sig[j, j])
                cut = max(self._cut[i, i], self._cut[j, j])
                self.set_coeff(i, j, eps, sig, cut)

    def prepare(self, types_np: np.ndarray) -> None:
        # materialize device tables host-side: a lazy build inside a traced
        # energy() would cache tracers
        self._tables()

    def _tables(self):
        """Flat [T*T] device coefficient tables (lj3/lj4 prefactors as in
        pair_rebomos.cpp:262-265 convention: 4 eps sig^12, 4 eps sig^6)."""
        if self._tabs is None:
            self._mix()
            lj3 = 4.0 * self._eps * self._sig ** 12
            lj4 = 4.0 * self._eps * self._sig ** 6
            cutsq = self._cut ** 2
            self._tabs = tuple(
                jnp.asarray(t.reshape(-1), self.dtype)
                for t in (lj3, lj4, cutsq))
        return self._tabs

    # -- PairStyle interface -----------------------------------------------
    def neighbor_requests(self):
        self._mix()
        return {"main": self._interaction_cut()}

    def _interaction_cut(self) -> np.ndarray:
        """[T+1, T+1] per-type-pair list cutoff."""
        return self._cut.copy()

    def ghost_margin(self, skin: float) -> float:
        # pairwise style: a halo atom's force row only needs neighbors
        # within one cutoff (no many-body environment), but the engine's
        # halo-as-owned mirror accumulation reads the halo atom's full
        # edge row — keep the conservative base default.
        return super().ghost_margin(skin)

    def _edge_flat_types(self, types, nbr: NeighborData, nlist):
        T = self.ntypes + 1
        tj = (nlist.jtype if nlist.jtype is not None
              else nbr.ghosts.all_types(types)[nlist.idx])
        return types[:, None] * T + tj

    def energy(self, x, strain, types, nbr: NeighborData, h,
               center_mask=None):
        nlist = nbr.lists["main"]
        dx, dy, dz, rsq, mask = edge_components(x, nbr.ghosts, nlist, h,
                                                strain)
        flat = self._edge_flat_types(types, nbr, nlist)
        e = self._pair_energy(rsq, mask, flat)
        if center_mask is not None:
            e = e * center_mask[:, None].astype(e.dtype)
        # full (directed) list — each pair appears twice
        return 0.5 * jnp.sum(e)

    def _pair_energy(self, rsq, mask, flat):
        lj3, lj4, cutsq = self._tables()
        r2inv = 1.0 / rsq
        r6inv = r2inv * r2inv * r2inv
        e = r6inv * (lj3[flat] * r6inv - lj4[flat])
        return jnp.where(mask & (rsq < cutsq[flat]), e, 0.0)

    def virial_peratom(self, x, types, nbr: NeighborData, h):
        """Per-atom virial via the edge-cotangent decomposition over the
        main list (ev_tally half-half split; potentials/base.py)."""
        import jax
        from .base import edge_virial_peratom
        nlist = nbr.lists["main"]
        n = x.shape[0]
        dx, dy, dz, _, mask = edge_components(x, nbr.ghosts, nlist, h,
                                              None)

        def e_of_d(dx_, dy_, dz_):
            rsq_ = jnp.where(mask, dx_ * dx_ + dy_ * dy_ + dz_ * dz_, 1.0)
            return self._edge_energy_sum(x, rsq_, mask, types, nbr, nlist)

        _, vjp = jax.vjp(e_of_d, dx, dy, dz)
        g = vjp(jnp.ones((), x.dtype))
        return edge_virial_peratom((dx, dy, dz), g, nlist, nbr.ghosts, n)

    def _edge_energy_sum(self, x, rsq, mask, types, nbr, nlist):
        flat = self._edge_flat_types(types, nbr, nlist)
        return 0.5 * jnp.sum(self._pair_energy(rsq, mask, flat))


@register_pair_style("lj/cut/coul/cut")
class PairLJCutCoulCut(PairLJCut):
    """lj/cut plus truncated 1/r Coulomb between static per-atom charges.

    Charges are bound once per system (Engine calls bind_charges(state.q)
    at setup — charges are constant over a run, like LAMMPS atom_style
    charge without charge-updating fixes).
    """

    name = "lj/cut/coul/cut"
    needs_charges = True

    def __init__(self, cut_lj: float, cut_coul: float | None = None,
                 ntypes: int = 1, qqr2e: float = 1.0, dtype=jnp.float64):
        super().__init__(cut_lj, ntypes=ntypes, dtype=dtype)
        self.cut_coul = float(cut_lj if cut_coul is None else cut_coul)
        self.qqr2e = float(qqr2e)
        self._q = None

    def bind_charges(self, q) -> None:
        self._q = jnp.asarray(q, self.dtype)

    def with_charges(self, q) -> "PairLJCutCoulCut":
        import copy
        view = copy.copy(self)
        view._q = q
        return view

    def for_sharded(self) -> "PairStyle":
        # drop any globally-bound charges: per-shard local charges arrive
        # via with_charges (ShardedEngine._pair_local) each trace
        return self.with_charges(None)

    def _interaction_cut(self) -> np.ndarray:
        return np.maximum(self._cut, self.cut_coul)

    def _edge_energy_sum(self, x, rsq, mask, types, nbr, nlist):
        flat = self._edge_flat_types(types, nbr, nlist)
        e = self._pair_energy(rsq, mask, flat)
        q_all = jnp.concatenate([self._q, self._q[nbr.ghosts.owner]])
        qq = self._q[:, None] * q_all[nlist.idx]
        ecoul = self.qqr2e * qq / jnp.sqrt(rsq)
        e = e + jnp.where(mask & (rsq < self.cut_coul ** 2), ecoul, 0.0)
        return 0.5 * jnp.sum(e)

    def energy(self, x, strain, types, nbr: NeighborData, h,
               center_mask=None):
        if self._q is None:
            raise ValueError("lj/cut/coul/cut: bind_charges() was never "
                             "called (system has no charge array)")
        nlist = nbr.lists["main"]
        dx, dy, dz, rsq, mask = edge_components(x, nbr.ghosts, nlist, h,
                                                strain)
        flat = self._edge_flat_types(types, nbr, nlist)
        e = self._pair_energy(rsq, mask, flat)
        q_all = jnp.concatenate([self._q, self._q[nbr.ghosts.owner]])
        qq = self._q[:, None] * q_all[nlist.idx]
        ecoul = self.qqr2e * qq / jnp.sqrt(rsq)
        e = e + jnp.where(mask & (rsq < self.cut_coul ** 2), ecoul, 0.0)
        if center_mask is not None:
            e = e * center_mask[:, None].astype(e.dtype)
        return 0.5 * jnp.sum(e)
