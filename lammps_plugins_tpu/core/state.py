"""Atom state pytree — TPU-native equivalent of LAMMPS's Atom arrays.

The reference plugins read/write SoA arrays x/v/f/q/type/tag/mask/image with
counts nlocal/nghost/nmax (pair_aeam.cpp:141-145, fix_bfield.cpp:332-342).
Here the whole system state is one immutable pytree of fixed-shape device
arrays; ghosts are *not* stored (they are regenerated inside energy functions
from owned positions + image shifts, see neighbor/ghost.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .box import Box


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class State:
    """Simulation state.

    Attributes:
      x:      [N,3] wrapped positions
      v:      [N,3] velocities
      f:      [N,3] forces from the last force evaluation
      type:   [N]   1-based atom types (LAMMPS convention)
      q:      [N]   charges
      image:  [N,3] integer periodic image counters
      mass:   [T+1] per-type masses, index 0 unused (LAMMPS 1-based types)
      box:    Box
      step:   scalar int — current timestep (update->ntimestep)
      extras: dict of fix-private per-step state (e.g. Nose-Hoover chain
              variables, bfield v0 snapshot); part of the pytree.
    """

    x: jnp.ndarray
    v: jnp.ndarray
    f: jnp.ndarray
    type: jnp.ndarray
    q: jnp.ndarray
    image: jnp.ndarray
    mass: jnp.ndarray
    box: Box
    step: jnp.ndarray
    extras: Dict[str, Any]

    # -- pytree plumbing ---------------------------------------------------
    def tree_flatten(self):
        children = (self.x, self.v, self.f, self.type, self.q, self.image,
                    self.mass, self.box, self.step, self.extras)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- convenience -------------------------------------------------------
    @property
    def natoms(self) -> int:
        return self.x.shape[0]

    @property
    def per_atom_mass(self) -> jnp.ndarray:
        """[N] mass of each atom via its type (mass[type[i]])."""
        return self.mass[self.type]

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)

    @classmethod
    def create(cls, x, type, box: Box, mass, v=None, q=None, image=None,
               dtype=None) -> "State":
        # build in numpy, transfer once (eager jnp.zeros would compile on
        # remote-TPU backends)
        import numpy as np
        x = jnp.asarray(np.asarray(x), dtype=dtype)
        n = x.shape[0]
        dtype = x.dtype
        zeros3 = np.zeros((n, 3))
        return cls(
            x=x,
            v=(jnp.asarray(zeros3, dtype) if v is None
               else jnp.asarray(np.asarray(v), dtype)),
            f=jnp.asarray(zeros3, dtype),
            type=jnp.asarray(np.asarray(type), jnp.int32),
            q=(jnp.asarray(np.zeros(n), dtype) if q is None
               else jnp.asarray(np.asarray(q), dtype)),
            image=(jnp.asarray(np.zeros((n, 3)), jnp.int32) if image is None
                   else jnp.asarray(np.asarray(image), jnp.int32)),
            mass=jnp.asarray(np.asarray(mass), dtype),
            box=box,
            step=jnp.asarray(0, jnp.int32),
            extras={},
        )
