"""Pair-style interface and plugin registry.

TPU-native analogue of the LAMMPS plugin registration protocol
(USER-AEAM/aeamplugin.cpp:14-28 etc. register factory creators with the host):
pair styles and fixes register themselves by name in a Python registry, and
scenes instantiate them LAMMPS-style (`pair_style rebomos`,
`pair_coeff * * file elems...`).

A PairStyle is fundamentally one differentiable function

    E(x, strain) -> scalar potential energy

over fixed-shape neighbor structures.  Forces are exact autodiff gradients —
the reference's hand-written force loops (pair_rebomos.cpp:571-847,
pair_aeam.cpp:309-476) are the analytic gradients of its energy, so
grad(E) reproduces them to rounding — and the virial is the strain
derivative, which equals virial_fdotr_compute for conservative forces.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..neighbor.build import NeighborData


def edge_virial_peratom(dxyz, gxyz, nlist, ghosts, n):
    """[n, 6] per-atom virial from per-edge displacements and cotangents.

    Per-edge tensor v_e = -(d_e ⊗ G_e) under the strain convention of
    `edge_components` (d'_a = d_a + Σ_b d_b·strain[b,a]), so
    Σ_e v_e equals the global strain-derivative virial EXACTLY — the
    per-atom tally is ev_tally's half-half pair split generalized to
    many-body cotangents.  The reference instead distributes 3-body
    terms in thirds (v_tally3, pair_rebomos.cpp:710,725; v_tally2
    :725,843; pair_aeam.cpp:472): per-atom values differ by that split
    convention, the totals are identical (same class of decomposition;
    cf. the documented pe/atom p_ij split deviation).
    Component order: xx, yy, zz, xy, xz, yz (LAMMPS vatom order).
    """
    dx, dy, dz = dxyz
    gx, gy, gz = gxyz
    live = nlist.mask
    comps = (dx * gx, dy * gy, dz * gz, dx * gy, dx * gz, dy * gz)
    per_edge = jnp.stack(
        [jnp.where(live, -c, 0.0) for c in comps], axis=-1)  # [N,K,6]
    vat = 0.5 * jnp.sum(per_edge, axis=1)
    owner_all = jnp.concatenate(
        [jnp.arange(n, dtype=ghosts.owner.dtype), ghosts.owner])
    j_owner = owner_all[nlist.idx]
    return vat.at[j_owner.reshape(-1)].add(0.5 * per_edge.reshape(-1, 6))


class PairStyle:
    """Base class: subclasses implement neighbor_requests() and energy()."""

    name: str = "none"
    #: style reads per-atom charges (the engine then calls bind_charges
    #: with state.q at setup — cf. LAMMPS atom->q consumers)
    needs_charges: bool = False

    def bind_charges(self, q) -> None:
        """Receive the system's static per-atom charge array (no-op for
        charge-free styles)."""

    def with_charges(self, q) -> "PairStyle":
        """A view of this style bound to a (possibly traced) charge array
        for the local row space — used by the sharded engine, which
        supplies the per-shard [owned | halo] charges each trace."""
        return self

    def neighbor_requests(self) -> Mapping[str, np.ndarray]:
        """name -> cutoff (scalar or [T+1,T+1] per-type-pair matrix)."""
        raise NotImplementedError

    def prepare(self, types_np: np.ndarray) -> None:
        """Optional host-side setup from the system's (static) atom types.

        Called once by the Engine before the first evaluation — the
        analogue of Pair::init_style seeing the atom population.  Styles
        use it to precompute type-derived index sets (e.g. AEAM's angular
        centers) that would otherwise need dynamic shapes under jit."""

    def energy(self, x: jnp.ndarray, strain: jnp.ndarray,
               types: jnp.ndarray, nbr: NeighborData,
               h: jnp.ndarray, center_mask=None) -> jnp.ndarray:
        """Total potential energy (pure function; jit/grad-safe).

        center_mask: optional [N] bool selecting which rows of x count as
        owned centers — used by the spatial decomposition, where x also
        carries halo atoms whose energy is owned by another device.
        """
        raise NotImplementedError

    def for_sharded(self) -> "PairStyle":
        """A view of this style configured for per-shard local evaluation.

        Under spatial decomposition every energy/force call sees a
        per-shard LOCAL row space ([owned | halo] blocks), so any
        host-precomputed per-atom index set built from the global type
        array in prepare() would index the wrong rows — styles that cache
        such sets override this to return a copy with them dropped.  The
        returned object may share all table arrays with the original."""
        return self

    def max_cutoff(self) -> float:
        return max(float(np.max(np.asarray(c)))
                   for c in self.neighbor_requests().values())

    def ghost_margin(self, skin: float) -> float:
        """Halo width required for exact owned forces under sharding.

        With halo-as-owned force evaluation, a halo atom h whose edge
        mirrors into an owned force sum (r(h, owned) <= tier_cut + skin)
        needs its own many-body environment complete (another tier_mb +
        skin), so the halo must extend tier_cut + tier_mb + 2*skin for
        every many-body tier — the TPU analogue of LAMMPS cutghost
        (pair_rebomos.cpp:261 adds cutghost = rcmax on top of the master
        list for exactly this).  The conservative default doubles the max
        cutoff; styles override with their per-tier structure.
        """
        return 2.0 * (self.max_cutoff() + skin)

    # ------------------------------------------------------------------
    def energy_force_virial(self, x, types, nbr, h):
        """(E, F, W): energy, forces = -dE/dx, virial tensor = -dE/dstrain."""
        strain0 = jnp.zeros((3, 3), dtype=x.dtype)

        def e(x_, s_):
            return self.energy(x_, s_, types, nbr, h)

        E, (gx, gs) = jax.value_and_grad(e, argnums=(0, 1))(x, strain0)
        return E, -gx, -gs

    def energy_virial(self, x, types, nbr, h):
        """(E, W) without forces — for thermo rows, where f is already
        current from the step itself."""
        strain0 = jnp.zeros((3, 3), dtype=x.dtype)

        def e(s_):
            return self.energy(x, s_, types, nbr, h)

        E, gs = jax.value_and_grad(e)(strain0)
        return E, -gs

    def forces(self, x, types, nbr, h):
        """Forces only (hot path): no strain branch, no virial backward.

        The reference computes the virial every step via virial_fdotr
        (pair_rebomos.cpp:110), but only thermo output consumes it; here
        the per-step work is pure -dE/dx and (E, W) are evaluated once per
        thermo row instead (run/simulation.py)."""
        return -jax.grad(lambda x_: self.energy(x_, None, types, nbr, h))(x)

    def virial_peratom(self, x, types, nbr, h):
        """[N, 6] per-atom virial (vatom; the ev_tally/v_tally per-atom
        accumulation contract, SURVEY §2.4).  Sums to the global
        strain-derivative virial exactly; see edge_virial_peratom for the
        split convention.  Diagnostics path (compute stress/atom, dumps)
        — not the hot loop."""
        raise NotImplementedError(
            f"pair_style {self.name} does not implement per-atom virial")


# registries live in ..registry (shared with fixes); re-exported here
from ..registry import (  # noqa: E402,F401
    PAIR_STYLES, FIX_STYLES, register_pair_style, register_fix_style,
    create_pair_style, create_fix_style,
)
