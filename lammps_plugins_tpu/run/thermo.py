"""Thermo quantities — LAMMPS `thermo_style custom` equivalents.

Pure functions of (state, energy, virial) evaluated under jit; the driver
prints rows every `thermo` steps like log.rebomos-bulk.1:53-56.

Conventions match LAMMPS thermo.cpp / compute_temp.cpp / compute_pressure.cpp:
  temp: T = sum(m v^2) * mvv2e / (dof * boltz), dof = 3N - 3
  ke:   0.5 * sum(m v^2) * mvv2e
  press: P_ab = (sum m v_a v_b * mvv2e + W_ab) / V * nktv2p, scalar = tr/3
where W is the virial tensor (here: the strain derivative -dE/deps, which
equals the reference's virial_fdotr_compute for conservative forces).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.state import State
from ..core.units import UnitSystem


def kinetic_tensor(state: State, units: UnitSystem) -> jnp.ndarray:
    m = state.per_atom_mass
    v = state.v
    # explicit components (an einsum contraction would hit the MXU at
    # bfloat16 precision on TPU)
    rows = [[jnp.sum(m * v[:, a] * v[:, b]) for b in range(3)]
            for a in range(3)]
    return units.mvv2e * jnp.stack([jnp.stack(r) for r in rows])


def kinetic_energy(state: State, units: UnitSystem) -> jnp.ndarray:
    m = state.per_atom_mass
    return 0.5 * units.mvv2e * jnp.sum(m * jnp.sum(state.v ** 2, axis=1))


def temperature(state: State, units: UnitSystem, extra_dof: int = 3):
    """LAMMPS compute temp: dof = 3N - extra_dof (default 3)."""
    dof = 3 * state.natoms - extra_dof
    return 2.0 * kinetic_energy(state, units) / (dof * units.boltz)


def pressure_tensor(state: State, virial_w: jnp.ndarray,
                    units: UnitSystem) -> jnp.ndarray:
    vol = state.box.volume
    kin = kinetic_tensor(state, units)
    return (kin + virial_w) / vol * units.nktv2p


def pressure(state: State, virial_w, units: UnitSystem):
    return jnp.trace(pressure_tensor(state, virial_w, units)) / 3.0


def thermo_row(state: State, pe, virial_w, units: UnitSystem,
               fix_energy=0.0) -> dict:
    """All standard quantities; the driver selects columns."""
    ke = kinetic_energy(state, units)
    alpha, beta, gamma = state.box.cell_angles_deg()
    ptens = pressure_tensor(state, virial_w, units)
    h = state.box.h
    return {
        "step": state.step,
        "temp": temperature(state, units),
        "press": jnp.trace(ptens) / 3.0,
        "pe": pe + fix_energy,
        "ke": ke,
        "etotal": pe + fix_energy + ke,
        "vol": state.box.volume,
        "cellalpha": alpha,
        "cellbeta": beta,
        "cellgamma": gamma,
        # diagonal pressure components and box edges (thermo.cpp custom
        # keywords pxx/pyy/pzz/pxy/pxz/pyz and lx/ly/lz)
        "pxx": ptens[0, 0], "pyy": ptens[1, 1], "pzz": ptens[2, 2],
        "pxy": 0.5 * (ptens[0, 1] + ptens[1, 0]),
        "pxz": 0.5 * (ptens[0, 2] + ptens[2, 0]),
        "pyz": 0.5 * (ptens[1, 2] + ptens[2, 1]),
        "lx": h[0, 0], "ly": h[1, 1], "lz": h[2, 2],
    }
