"""Geometric regions — LAMMPS `region` command equivalents.

jit-able pure predicates (SURVEY.md section 2.4 "Domain/geometry"): fix
bfield filters atoms by region->match (fix_bfield.cpp:370), `set region`
and `create_atoms ... region` select by containment.

Coordinates are Cartesian; `inside(x)` returns a boolean per atom.  LAMMPS
`side out` regions are the complement.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

BIG = 1.0e30


@dataclasses.dataclass(frozen=True)
class Region:
    name: str = "region"

    def inside(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def complement(self) -> "Region":
        return _Complement(inner=self)


@dataclasses.dataclass(frozen=True)
class _Complement(Region):
    inner: Region = None

    def inside(self, x):
        return ~self.inner.inside(x)


@dataclasses.dataclass(frozen=True)
class Block(Region):
    """region ID block xlo xhi ylo yhi zlo zhi (INF/EDGE -> +-BIG)."""

    lo: tuple = (-BIG, -BIG, -BIG)
    hi: tuple = (BIG, BIG, BIG)

    def inside(self, x):
        lo = jnp.asarray(self.lo, x.dtype)
        hi = jnp.asarray(self.hi, x.dtype)
        return jnp.all((x >= lo) & (x <= hi), axis=-1)


@dataclasses.dataclass(frozen=True)
class Prism(Region):
    """region ID prism xlo xhi ylo yhi zlo zhi xy xz yz.

    Containment via fractional coordinates of the tilted cell (matches
    LAMMPS RegPrism::inside, which inverts the edge-vector matrix).
    """

    lo: tuple = (0.0, 0.0, 0.0)
    hi: tuple = (1.0, 1.0, 1.0)
    tilt: tuple = (0.0, 0.0, 0.0)      # xy, xz, yz

    def h_matrix(self) -> np.ndarray:
        lx = self.hi[0] - self.lo[0]
        ly = self.hi[1] - self.lo[1]
        lz = self.hi[2] - self.lo[2]
        xy, xz, yz = self.tilt
        return np.array([[lx, 0.0, 0.0], [xy, ly, 0.0], [xz, yz, lz]])

    def inside(self, x):
        h = jnp.asarray(self.h_matrix(), x.dtype)
        lo = jnp.asarray(self.lo, x.dtype)
        m = _tri_inv(h)
        v = x - lo
        # component-wise (TPU f32 @ is bf16 by default)
        f = jnp.stack([v[..., 0] * m[0, a] + v[..., 1] * m[1, a]
                       + v[..., 2] * m[2, a] for a in range(3)], axis=-1)
        return jnp.all((f >= 0.0) & (f <= 1.0), axis=-1)


@dataclasses.dataclass(frozen=True)
class Sphere(Region):
    center: tuple = (0.0, 0.0, 0.0)
    radius: float = 1.0

    def inside(self, x):
        c = jnp.asarray(self.center, x.dtype)
        return jnp.sum((x - c) ** 2, axis=-1) <= self.radius ** 2


def _tri_inv(h):
    """Closed-form inverse of a lower-triangular 3x3 (see Box.h_inv)."""
    lx, ly, lz = h[0, 0], h[1, 1], h[2, 2]
    xy, xz, yz = h[1, 0], h[2, 0], h[2, 1]
    zero = jnp.zeros_like(lx)
    return jnp.stack([
        jnp.stack([1.0 / lx, zero, zero]),
        jnp.stack([-xy / (lx * ly), 1.0 / ly, zero]),
        jnp.stack([(xy * yz - ly * xz) / (lx * ly * lz),
                   -yz / (ly * lz), 1.0 / lz]),
    ])
