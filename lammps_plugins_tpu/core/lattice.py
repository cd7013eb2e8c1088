"""Lattice definitions and atom creation — LAMMPS `lattice` / `create_atoms`.

Host-side (numpy) scene construction.  Reproduces the semantics exercised by
the reference inputs:
  * `lattice custom scale a1 ... a2 ... a3 ... basis ... origin ...`
    (USER-REBOMOS/in.rebomos-bulk:3-12)
  * `lattice fcc a` (USER-AEAM/sample.in:8)
  * `create_atoms <type> box basis i j ...` filling a (possibly triclinic)
    box with every lattice point whose fractional box coordinate lies in
    [0, 1) — verified against the golden log (288 atoms, 96 Mo + 192 S,
    log.rebomos-bulk.1:24).

Lattice spacings (xlattice etc.) are the axis-aligned bounding spans of the
scaled unit cell, as printed by the log ("Lattice spacing in x,y,z =
4.7867748 2.7651482 13.982768", log.rebomos-bulk.1:17); region coordinates
in lattice units are multiplied by these spacings.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from .box import Box


@dataclasses.dataclass
class Lattice:
    a1: np.ndarray
    a2: np.ndarray
    a3: np.ndarray
    basis: np.ndarray          # [nb, 3] fractional (lattice-vector) coords
    origin: np.ndarray         # [3] fractions of a unit cell
    scale: float = 1.0

    @classmethod
    def custom(cls, scale, a1, a2, a3, basis, origin=(0.0, 0.0, 0.0)):
        return cls(a1=np.asarray(a1, float) * scale,
                   a2=np.asarray(a2, float) * scale,
                   a3=np.asarray(a3, float) * scale,
                   basis=np.asarray(basis, float),
                   origin=np.asarray(origin, float),
                   scale=scale)

    @classmethod
    def fcc(cls, a, origin=(0.0, 0.0, 0.0)):
        basis = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                          [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
        return cls(a1=np.array([a, 0.0, 0.0]), a2=np.array([0.0, a, 0.0]),
                   a3=np.array([0.0, 0.0, a]), basis=basis,
                   origin=np.asarray(origin, float), scale=a)

    @classmethod
    def bcc(cls, a, origin=(0.0, 0.0, 0.0)):
        basis = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
        return cls(a1=np.array([a, 0.0, 0.0]), a2=np.array([0.0, a, 0.0]),
                   a3=np.array([0.0, 0.0, a]), basis=basis,
                   origin=np.asarray(origin, float), scale=a)

    @classmethod
    def sc(cls, a, origin=(0.0, 0.0, 0.0)):
        return cls(a1=np.array([a, 0.0, 0.0]), a2=np.array([0.0, a, 0.0]),
                   a3=np.array([0.0, 0.0, a]),
                   basis=np.zeros((1, 3)),
                   origin=np.asarray(origin, float), scale=a)

    @property
    def primitive(self) -> np.ndarray:
        """Rows a1, a2, a3 (already scaled)."""
        return np.stack([self.a1, self.a2, self.a3])

    def spacings(self) -> np.ndarray:
        """LAMMPS xlattice/ylattice/zlattice: bounding spans of the cell."""
        corners = []
        for i in (0, 1):
            for j in (0, 1):
                for k in (0, 1):
                    corners.append(i * self.a1 + j * self.a2 + k * self.a3)
        corners = np.array(corners)
        return corners.max(axis=0) - corners.min(axis=0)

    def lattice_points(self, cell_range) -> Tuple[np.ndarray, np.ndarray]:
        """All (position, basis_index) for unit cells in the given ranges.

        Position of basis b in cell (i,j,k):
          r = (i + bx) a1 + (j + by) a2 + (k + bz) a3
              + (ox * xlattice, oy * ylattice, oz * zlattice)
        i.e. the `origin` keyword shifts the lattice by fractions of the
        axis-aligned lattice *spacings*, applied in Cartesian after the
        primitive transform.  Verified against the golden log: with the
        in.rebomos-bulk custom lattice (origin 0.1 0.1 0.1, box incommensurate
        with the primitive cell) only this interpretation reproduces the
        reference thermo rows digit-for-digit (log.rebomos-bulk.1:54-56);
        shifting by fractions of the cell vectors instead changes which
        boundary atoms are kept and perturbs T(10) by ~5e-6.
        """
        (ilo, ihi), (jlo, jhi), (klo, khi) = cell_range
        ii, jj, kk = np.meshgrid(np.arange(ilo, ihi + 1),
                                 np.arange(jlo, jhi + 1),
                                 np.arange(klo, khi + 1), indexing="ij")
        cells = np.stack([ii.ravel(), jj.ravel(), kk.ravel()], axis=1)
        # [ncell, nb, 3] fractional lattice coords
        frac = cells[:, None, :] + self.basis[None, :, :]
        pos = frac.reshape(-1, 3) @ self.primitive
        pos = pos + self.origin * self.spacings()
        bidx = np.tile(np.arange(len(self.basis)), len(cells))
        return pos, bidx


def create_atoms_box(lattice: Lattice, box: Box,
                     basis_types: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Fill `box` with lattice atoms (LAMMPS create_atoms ... box).

    basis_types: 1-based atom type per basis site (the `basis i j` keywords,
    in.rebomos-bulk:16-22).
    Returns (positions [N,3], types [N]).
    """
    h = box.h_np()
    lo = box.lo_np()

    # bounding cell ranges: box corners in lattice coords, +/- 2 margin
    corners = box.corners() - lattice.origin * lattice.spacings()
    lat_inv = np.linalg.inv(lattice.primitive)
    lat_coords = corners @ lat_inv
    lolat = np.floor(lat_coords.min(axis=0)).astype(int) - 2
    hilat = np.ceil(lat_coords.max(axis=0)).astype(int) + 2

    pos, bidx = lattice.lattice_points(
        [(lolat[0], hilat[0]), (lolat[1], hilat[1]), (lolat[2], hilat[2])])

    frac = (pos - lo) @ np.linalg.inv(h)
    keep = np.all((frac >= 0.0) & (frac < 1.0), axis=1)
    pos, bidx = pos[keep], bidx[keep]

    types = np.asarray(basis_types, dtype=np.int32)[bidx]
    # deterministic ordering (z, y, x) for reproducibility
    order = np.lexsort((pos[:, 0], pos[:, 1], pos[:, 2]))
    return pos[order], types[order]
