"""pair_style none / zero — no pairwise interactions.

LAMMPS equivalents used for pure-fix dynamics (e.g. the fix bfield
cyclotron validation, BASELINE.json config 2, which integrates free charged
particles in a uniform field).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import PairStyle, register_pair_style


@register_pair_style("none")
@register_pair_style("zero")
class PairNone(PairStyle):
    def __init__(self, cutoff: float = 1.0):
        self.cutoff = cutoff

    def neighbor_requests(self):
        return {"main": self.cutoff}

    def energy(self, x, strain, types, nbr, h, center_mask=None):
        # depends on x/strain so grad shapes are well-defined (strain is
        # None on the forces-only hot path)
        e = 0.0 * jnp.sum(x)
        if strain is not None:
            e = e + 0.0 * jnp.sum(strain)
        return e
