"""Canonical scenes from the reference example inputs.

These build the exact systems of the reference inputs so golden-log tests and
benchmarks share one construction path.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..core.box import Box
from ..core.lattice import Lattice, create_atoms_box
from ..core.state import State


#: MoS2 2H lattice from USER-REBOMOS/in.rebomos-bulk:3-12.
MOS2_A1 = (3.1903157234, 0.0, 0.0)
MOS2_A2 = (-1.5964590311, 2.7651481541, 0.0)
MOS2_A3 = (0.0, 0.0, 13.9827680588)
MOS2_BASIS = (
    (0.0, 0.0, 3.0 / 4.0),
    (0.0, 0.0, 1.0 / 4.0),
    (2.0 / 3.0, 1.0 / 3.0, 0.862008989),
    (1.0 / 3.0, 2.0 / 3.0, 0.137990996),
    (1.0 / 3.0, 2.0 / 3.0, 0.362008989),
    (2.0 / 3.0, 1.0 / 3.0, 0.637991011),
)
MOS2_BASIS_TYPES = (1, 1, 2, 2, 2, 2)      # Mo Mo S S S S
MOS2_MASSES = (95.95, 32.065)              # in.rebomos-bulk:24-25


def mos2_lattice(origin=(0.1, 0.1, 0.1)) -> Lattice:
    return Lattice.custom(1.0, MOS2_A1, MOS2_A2, MOS2_A3,
                          MOS2_BASIS, origin=origin)


def spatial_sort(pos: np.ndarray, types: np.ndarray, cell: float = 4.8):
    """Order atoms by (z, y, x) spatial cells (stable).

    Spatially local atom ids bound the column distance between an atom
    and its short-range neighbors, which the windowed mirror-combine
    (neighbor/device_build.py: RebuildPlan.mirror_window) converts into
    small per-chunk gather operands.  The analogue of LAMMPS
    `atom_modify sort` (on by default there, bin 0.0 -> neighbor cutoff).
    Off by default in the scene generators (LPT_SORT_SCENE=1 to enable):
    with the windowed combine measured as an in-step dead end
    (probe_mirror18/19, choose_mirror_window), sorting only costs the
    bench ~2% in changed gather patterns.
    """
    mn = pos.min(axis=0)
    c3 = ((pos - mn) / cell).astype(np.int64)
    dims = c3.max(axis=0) + 1
    key = (c3[:, 2] * dims[1] + c3[:, 1]) * dims[0] + c3[:, 0]
    order = np.argsort(key, kind="stable")
    return pos[order], types[order]


def alsi_sample(nc: int = 20, si_fraction: float = 0.0075, seed: int = 7683797,
                a: float = 4.045, dtype=jnp.float64):
    """The USER-AEAM/sample.in scene: nc^3-cell fcc Al box with a random
    Si substitution fraction (sample.in:8-19).  Default nc=20 -> 32,000
    atoms.  Si selection is statistically equivalent to LAMMPS `set
    type/fraction` (coordinate-hashed RNG; no golden log constrains it)."""
    from ..fixes.velocity import set_type_fraction

    lat = Lattice.fcc(a)
    box = Box.orthogonal([a * nc] * 3, dtype=dtype)
    pos, types = create_atoms_box(lat, box, [1, 1, 1, 1])
    mass = np.array([0.0, 27.0, 28.0])     # AlSi.aeam per-element masses
    state = State.create(x=jnp.asarray(pos, dtype=dtype), type=types,
                         box=box, mass=mass, dtype=dtype)
    return set_type_fraction(state, 2, si_fraction, seed)


def rebomos_bulk_commensurate(nx: int = 34, ny: int = 48, nz: int = 10,
                              dtype=jnp.float32):
    """Defect-free MoS2 bulk: box vectors are exact integer combinations of
    the lattice vectors (A = nx a1, B = (ny/2) a1 + ny a2, C = nz a3), so
    the crystal tiles the periodic box perfectly.

    The reference's own example boxes (and rebomos_bulk here) are slightly
    incommensurate with the custom lattice — their periodic boundaries
    carry built-in defects, down to 1.8 A cross-boundary pairs at some
    sizes.  Benchmarks use this scene so throughput is measured on sane
    physics.  Defaults give 97,920 atoms (~the BASELINE 100k config).
    """
    if ny % 2:
        raise ValueError("ny must be even (B = ny/2 a1 + ny a2)")
    a1 = np.asarray(MOS2_A1)
    a2 = np.asarray(MOS2_A2)
    a3 = np.asarray(MOS2_A3)
    A = nx * a1
    B = (ny // 2) * a1 + ny * a2
    C = nz * a3
    box = Box.triclinic(lx=A[0], ly=B[1], lz=C[2], xy=B[0], xz=C[0],
                        yz=C[1], dtype=dtype)

    basis = np.asarray(MOS2_BASIS)
    ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    cells = np.stack([ii.ravel(), jj.ravel(), kk.ravel()], 1).astype(float)
    frac = cells[:, None, :] + basis[None, :, :]
    pos = frac.reshape(-1, 3) @ np.stack([a1, a2, a3])
    types = np.tile(np.asarray(MOS2_BASIS_TYPES, np.int32), len(cells))
    # wrap into the box (host side, f64)
    h = box.h_np()
    f = pos @ np.linalg.inv(h)
    pos = (f - np.floor(f)) @ h
    if os.environ.get("LPT_SORT_SCENE"):
        pos, types = spatial_sort(pos, types)
    mass = np.array([0.0, *MOS2_MASSES])
    return State.create(x=jnp.asarray(pos, dtype=dtype), type=types,
                        box=box, mass=mass, dtype=dtype)


def rebomos_monolayer(nx: int = 34, ny: int = 48, vacuum: float = 20.0,
                      dtype=jnp.float32):
    """Single MoS2 layer in a vacuum slab — BASELINE.json config 4
    ("MoS2 monolayer replicated to 1M atoms") at nx=577, ny=578
    (1,000,518 atoms).

    In-plane construction matches rebomos_bulk_commensurate (A = nx a1,
    B = ny/2 a1 + ny a2 — defect-free tiling); the slab keeps one of the
    2H cell's two layers (the z=1/4 Mo plane with its two S planes,
    MOS2_BASIS rows 2,4,5) centered in `vacuum` of empty z.  The box stays
    z-periodic: the vacuum exceeds the 11.4 A interaction cutoff
    (pair_rebomos.cpp:257 cut3rebo) plus any reasonable skin, so periodic
    z-images cannot interact and the physics is a true isolated monolayer.
    """
    if ny % 2:
        raise ValueError("ny must be even (B = ny/2 a1 + ny a2)")
    a1 = np.asarray(MOS2_A1)
    a2 = np.asarray(MOS2_A2)
    c_bulk = MOS2_A3[2]
    basis = np.array([(0.0, 0.0, 0.25),                # Mo
                      (1.0 / 3.0, 2.0 / 3.0, 0.137990996),   # S below
                      (1.0 / 3.0, 2.0 / 3.0, 0.362008989)])  # S above
    z = basis[:, 2] * c_bulk
    thick = z.max() - z.min()
    z = z - z.min() + 0.5 * vacuum
    A = nx * a1
    B = (ny // 2) * a1 + ny * a2
    box = Box.triclinic(lx=A[0], ly=B[1], lz=thick + vacuum, xy=B[0],
                        dtype=dtype)
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    cells = np.stack([ii.ravel(), jj.ravel()], 1).astype(float)
    frac2 = cells[:, None, :] + basis[None, :, :2]
    xy = frac2.reshape(-1, 2) @ np.stack([a1[:2], a2[:2]])
    pos = np.concatenate([xy, np.tile(z, len(cells))[:, None]], axis=1)
    h = box.h_np()
    f = pos @ np.linalg.inv(h)
    pos = (f - np.floor(f)) @ h
    types = np.tile(np.asarray((1, 2, 2), np.int32), len(cells))
    if os.environ.get("LPT_SORT_SCENE"):
        pos, types = spatial_sort(pos, types)
    mass = np.array([0.0, *MOS2_MASSES])
    return State.create(x=jnp.asarray(pos, dtype=dtype), type=types,
                        box=box, mass=mass, dtype=dtype)


def rebomos_bulk(nx: int = 4, ny: int = 8, nz: int = 1, tilt_xy: float = -2.0,
                 dtype=jnp.float64):
    """The in.rebomos-bulk scene, optionally replicated.

    Defaults give the golden 288-atom cell:
      region box prism 0 4 0 8 0 1 -2.0 0.0 0.0  (lattice units)
      -> triclinic (0,0,0)..(19.147099, 22.121185, 13.982768), xy=-9.5735495
      (log.rebomos-bulk.1:21).
    """
    lat = mos2_lattice()
    sx, sy, sz = lat.spacings()
    box = Box.triclinic(lx=nx * sx, ly=ny * sy, lz=nz * sz,
                        xy=tilt_xy * sx, dtype=dtype)
    pos, types = create_atoms_box(lat, box, MOS2_BASIS_TYPES)
    mass = np.array([0.0, *MOS2_MASSES])
    state = State.create(x=jnp.asarray(pos, dtype=dtype), type=types,
                         box=box, mass=mass, dtype=dtype)
    return state
