"""Triclinic simulation box and periodic boundary machinery.

TPU-native equivalent of LAMMPS's Domain (SURVEY.md section 2.4): the box is a
3x3 cell matrix in LAMMPS "restricted triclinic" form,

    H = [[lx, 0,  0 ],
         [xy, ly, 0 ],
         [xz, yz, lz]]          (rows are the edge vectors a, b, c)

with Cartesian position r = lo + f @ H for fractional coordinate f.  All
operations are pure jnp functions usable under jit/grad.  Periodicity beyond
minimum-image range (the REBOMOS example has cutoff > L/2, see
log.rebomos-bulk.1:43-45 showing 4285 ghosts for 288 atoms) is handled by the
ghost/image expansion in neighbor/ghost.py, not here.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Box:
    """Periodic triclinic box. `h` rows are edge vectors; `lo` is the origin."""

    h: jnp.ndarray          # [3,3], lower-triangular (restricted triclinic)
    lo: jnp.ndarray         # [3]
    periodic: Tuple[bool, bool, bool] = (True, True, True)
    #: full-precision geometry masters (hashable aux, tuples of floats).
    #: For f32 device boxes, host-side geometry (lattice fills, ghost
    #: margins, wrapping) must use these: filtering lattice sites against
    #: the f32-rounded cell keeps a duplicate boundary layer (observed:
    #: 34,461 atoms in a 32,000-site fcc fill).
    h64: "tuple | None" = None
    lo64: "tuple | None" = None

    # -- pytree plumbing ---------------------------------------------------
    def tree_flatten(self):
        return (self.h, self.lo), (self.periodic, self.h64, self.lo64)

    @classmethod
    def tree_unflatten(cls, aux, children):
        h, lo = children
        if isinstance(aux, tuple) and len(aux) == 3 \
                and isinstance(aux[0], tuple) and (
                    aux[1] is None or isinstance(aux[1], tuple)):
            periodic, h64, lo64 = aux
        else:                     # pre-h64 pytrees (old checkpoints)
            periodic, h64, lo64 = aux, None, None
        return cls(h=h, lo=lo, periodic=periodic, h64=h64, lo64=lo64)

    @staticmethod
    def _master(arr) -> tuple:
        a = np.asarray(arr, np.float64)
        return tuple(map(tuple, a)) if a.ndim == 2 else tuple(a)

    # -- constructors ------------------------------------------------------
    @classmethod
    def orthogonal(cls, lengths, lo=(0.0, 0.0, 0.0), periodic=(True,) * 3,
                   dtype=jnp.float64):
        h64 = np.diag(np.asarray(lengths, np.float64))
        return cls(h=jnp.asarray(h64, dtype=dtype),
                   lo=jnp.asarray(lo, dtype=dtype), periodic=tuple(periodic),
                   h64=cls._master(h64), lo64=cls._master(lo))

    @classmethod
    def triclinic(cls, lx, ly, lz, xy=0.0, xz=0.0, yz=0.0,
                  lo=(0.0, 0.0, 0.0), periodic=(True,) * 3, dtype=jnp.float64):
        """LAMMPS-style box from edge lengths and tilt factors."""
        h64 = np.array([[lx, 0.0, 0.0],
                        [xy, ly, 0.0],
                        [xz, yz, lz]], np.float64)
        return cls(h=jnp.asarray(h64, dtype=dtype),
                   lo=jnp.asarray(lo, dtype=dtype), periodic=tuple(periodic),
                   h64=cls._master(h64), lo64=cls._master(lo))

    def with_geometry(self, h=None, lo=None) -> "Box":
        """Derive a new Box with updated cell matrix / origin.

        The only safe way to change geometry after construction: rebuilds the
        f64 masters (h64/lo64) alongside the device arrays, which
        ``dataclasses.replace(box, h=...)`` would leave stale — and then
        h_np()/corners()/lattice fills would silently use the old geometry.
        """
        new_h = self.h if h is None else jnp.asarray(h, dtype=self.h.dtype)
        new_lo = self.lo if lo is None else jnp.asarray(lo,
                                                        dtype=self.lo.dtype)
        return Box(h=new_h, lo=new_lo, periodic=self.periodic,
                   h64=self._master(h) if h is not None else self.h64,
                   lo64=self._master(lo) if lo is not None else self.lo64)

    # -- geometry ----------------------------------------------------------
    @property
    def h_inv(self) -> jnp.ndarray:
        """Closed-form inverse of the lower-triangular cell matrix.

        (Avoids jnp.linalg.inv, which lowers to an LU decomposition that TPU
        does not implement for f64; the restricted-triclinic form makes the
        inverse analytic anyway.)
        """
        h = self.h
        lx, ly, lz = h[0, 0], h[1, 1], h[2, 2]
        xy, xz, yz = h[1, 0], h[2, 0], h[2, 1]
        zero = jnp.zeros_like(lx)
        return jnp.stack([
            jnp.stack([1.0 / lx, zero, zero]),
            jnp.stack([-xy / (lx * ly), 1.0 / ly, zero]),
            jnp.stack([(xy * yz - ly * xz) / (lx * ly * lz),
                       -yz / (ly * lz), 1.0 / lz]),
        ])

    @property
    def volume(self) -> jnp.ndarray:
        h = self.h
        return jnp.abs(h[0, 0] * h[1, 1] * h[2, 2])

    @property
    def lengths(self) -> jnp.ndarray:
        """Edge vector lengths |a|, |b|, |c|."""
        return jnp.linalg.norm(self.h, axis=1)

    def perpendicular_widths(self) -> jnp.ndarray:
        """Distance between opposite box faces along each axis.

        Used to size the ghost-image shells: an image cell at shift n along
        axis d can only reach within `cutoff` of the home cell if
        (|n|-1) * width[d] < cutoff.
        """
        vol = self.volume
        a, b, c = self.h[0], self.h[1], self.h[2]
        wa = vol / jnp.linalg.norm(jnp.cross(b, c))
        wb = vol / jnp.linalg.norm(jnp.cross(c, a))
        wc = vol / jnp.linalg.norm(jnp.cross(a, b))
        return jnp.stack([wa, wb, wc])

    def cell_angles_deg(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(alpha, beta, gamma) in degrees; gamma is LAMMPS thermo `cellgamma`
        (angle between edge vectors a and b), cf. log.rebomos-bulk.1:54."""
        a, b, c = self.h[0], self.h[1], self.h[2]
        la, lb, lc = (jnp.linalg.norm(v) for v in (a, b, c))
        alpha = jnp.degrees(jnp.arccos(jnp.dot(b, c) / (lb * lc)))
        beta = jnp.degrees(jnp.arccos(jnp.dot(a, c) / (la * lc)))
        gamma = jnp.degrees(jnp.arccos(jnp.dot(a, b) / (la * lb)))
        return alpha, beta, gamma

    # -- coordinate transforms --------------------------------------------
    # All row-vector x matrix products are written component-wise: TPU
    # lowers f32 `@` to MXU bfloat16 by default, which corrupts coordinates
    # at the 1e-2 relative level — fatal for wrapping and image math.
    @staticmethod
    def _matvec3(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
        m = m.astype(v.dtype)
        return jnp.stack(
            [v[..., 0] * m[0, a] + v[..., 1] * m[1, a] + v[..., 2] * m[2, a]
             for a in range(3)], axis=-1)

    def to_fractional(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._matvec3(x - self.lo, self.h_inv)

    def from_fractional(self, f: jnp.ndarray) -> jnp.ndarray:
        return self._matvec3(f, self.h) + self.lo

    def wrap(self, x: jnp.ndarray, image: jnp.ndarray | None = None):
        """Wrap positions into the primary cell; update integer image flags.

        Mirrors LAMMPS Domain::pbc + image counters: the returned image
        counts how many box translations were applied so `unmap` can recover
        the continuous trajectory (fix_bfield.cpp:417 uses domain->unmap).
        """
        f = self.to_fractional(x)
        shift = jnp.floor(f)
        per = jnp.asarray(self.periodic)
        shift = jnp.where(per[None, :], shift, 0.0)
        xw = self.from_fractional(f - shift)
        if image is None:
            return xw, shift.astype(jnp.int32)
        return xw, image + shift.astype(jnp.int32)

    def unmap(self, x: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
        """Continuous (unwrapped) coordinates from wrapped x + image flags."""
        return x + self._matvec3(image.astype(x.dtype), self.h)

    # -- host-side helpers (numpy, used by scene builders and the neighbor
    # rebuild path; eager jnp ops are expensive on remote-compile TPU
    # backends, so host code must stay in numpy) ---------------------------
    def h_np(self) -> np.ndarray:
        if self.h64 is not None:
            return np.array(self.h64, dtype=np.float64)
        return np.asarray(self.h, dtype=np.float64)

    def lo_np(self) -> np.ndarray:
        if self.lo64 is not None:
            return np.array(self.lo64, dtype=np.float64)
        return np.asarray(self.lo, dtype=np.float64)

    def perpendicular_widths_np(self) -> np.ndarray:
        h = self.h_np()
        vol = abs(np.linalg.det(h))
        a, b, c = h
        return np.array([vol / np.linalg.norm(np.cross(b, c)),
                         vol / np.linalg.norm(np.cross(c, a)),
                         vol / np.linalg.norm(np.cross(a, b))])

    def wrap_np(self, x: np.ndarray, image: np.ndarray | None = None):
        """Host-side wrap (numpy mirror of wrap())."""
        h = self.h_np()
        lo = self.lo_np()
        f = (np.asarray(x, np.float64) - lo) @ np.linalg.inv(h)
        shift = np.floor(f)
        per = np.asarray(self.periodic)
        shift[:, ~per] = 0.0
        xw = (f - shift) @ h + lo
        ishift = shift.astype(np.int32)
        if image is None:
            return xw, ishift
        return xw, np.asarray(image) + ishift

    def cell_angles_deg_np(self):
        h = self.h_np()
        a, b, c = h
        la, lb, lc = (np.linalg.norm(v) for v in h)
        return (float(np.degrees(np.arccos(np.dot(b, c) / (lb * lc)))),
                float(np.degrees(np.arccos(np.dot(a, c) / (la * lc)))),
                float(np.degrees(np.arccos(np.dot(a, b) / (la * lb)))))

    def corners(self) -> np.ndarray:
        """The 8 Cartesian corners of the box (host-side numpy)."""
        h = self.h_np()
        lo = self.lo_np()
        out = []
        for i in (0, 1):
            for j in (0, 1):
                for k in (0, 1):
                    out.append(lo + i * h[0] + j * h[1] + k * h[2])
        return np.array(out)
