"""fix bfield (cyclotron validation) and fix nvt (thermostat control)."""

import numpy as np
import jax.numpy as jnp

from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.core.box import Box
from lammps_plugins_tpu.core.state import State
from lammps_plugins_tpu.fixes.bfield import FixBfield
from lammps_plugins_tpu.fixes.nve import FixNVE
from lammps_plugins_tpu.fixes.nvt import FixNVT
from lammps_plugins_tpu.fixes.velocity import velocity_create
from lammps_plugins_tpu.potentials.none import PairNone
from lammps_plugins_tpu.run.simulation import Engine


def test_bfield_cyclotron_frequency():
    """BASELINE.json config 2: a free charged particle in uniform B must
    gyrate at omega_c = qBm2f * q B / m (fix_bfield.cpp:375-377), with the
    weak-field analytic integrator holding the radius nearly constant."""
    u = units.METAL
    box = Box.orthogonal([200.0, 200.0, 200.0], dtype=jnp.float64)
    m, q, B = 1.0, 1.0, 10.0
    v0 = 0.5                                      # A/ps, in +x
    state = State.create(x=jnp.array([[100.0, 100.0, 100.0]]),
                         type=np.array([1]), box=box,
                         mass=np.array([0.0, m]),
                         v=jnp.array([[v0, 0.0, 0.0]]),
                         q=jnp.array([q]))
    omega_c = u.qBm2f * q * B / m                 # rad/ps
    period = 2 * np.pi / omega_c                  # ps
    dt = period / 2000                            # well inside weak-field
    nsteps = 2000                                 # one full gyration

    eng = Engine(state, PairNone(cutoff=1.0),
                 [FixBfield(0.0, 0.0, B), FixNVE()], u, dt=dt,
                 check_every=100)
    eng.run(nsteps)
    xf = np.asarray(eng.state.x[0])
    vf = np.asarray(eng.state.v[0])

    # after one cyclotron period the particle returns to its start
    assert np.linalg.norm(xf - [100.0, 100.0, 100.0]) < 5e-3 * (v0 * period)
    assert abs(vf[0] - v0) < 5e-3 * v0
    assert abs(vf[1]) < 5e-3 * v0
    # speed (radius) conserved by the rotation
    assert abs(np.linalg.norm(vf) - v0) < 1e-3 * v0


def test_bfield_half_period_reverses_velocity():
    u = units.METAL
    box = Box.orthogonal([200.0] * 3, dtype=jnp.float64)
    m, q, B = 1.0, 1.0, 10.0
    state = State.create(x=jnp.array([[100.0, 100.0, 100.0]]),
                         type=np.array([1]), box=box,
                         mass=np.array([0.0, m]),
                         v=jnp.array([[0.5, 0.0, 0.0]]),
                         q=jnp.array([q]))
    omega_c = u.qBm2f * q * B / m
    dt = (2 * np.pi / omega_c) / 2000
    eng = Engine(state, PairNone(1.0), [FixBfield(0.0, 0.0, B), FixNVE()],
                 u, dt=dt, check_every=100)
    eng.run(1000)
    vf = np.asarray(eng.state.v[0])
    assert abs(vf[0] + 0.5) < 5e-3      # reversed
    assert abs(vf[2]) < 1e-12           # no z coupling for Bz


def test_nvt_conserved_quantity(aeam_file):
    """Nose-Hoover conserved quantity H = KE + PE + E_thermostat must be
    conserved to discretization level — the oracle LAMMPS itself uses for
    FixNH (a wrong chain mass or half-step order drifts H secularly).
    Exercises the sample.in thermostat (fix 1 all nvt temp 863 863 0.1)."""
    from lammps_plugins_tpu.potentials.aeam import AEAM
    from lammps_plugins_tpu.core.lattice import Lattice, create_atoms_box

    pair = AEAM.from_file(aeam_file, ["Al", "Si"])
    a = 4.045
    lat = Lattice.fcc(a)
    box = Box.orthogonal([a * 2] * 3)
    pos, types = create_atoms_box(lat, box, [1, 1, 1, 1])
    state = State.create(x=jnp.asarray(pos), type=types, box=box,
                         mass=pair.masses)
    state = velocity_create(state, units.METAL, 600.0, seed=3)
    nvt = FixNVT(863.0, 863.0, 0.1)
    eng = Engine(state, pair, [nvt], units.METAL, check_every=50)

    def hamiltonian():
        pe, _ = eng.evaluate()
        m = np.asarray(eng.state.per_atom_mass)
        v = np.asarray(eng.state.v)
        ke = 0.5 * units.METAL.mvv2e * float((m * (v ** 2).sum(1)).sum())
        eth = float(nvt.energy(eng.state, eng.ctx))
        return float(pe) + ke + eth

    h0 = hamiltonian()
    drifts = []
    for _ in range(8):
        eng.run(250)
        drifts.append(abs(hamiltonian() - h0))
    # 32 atoms, KE scale ~ 32*3/2*kB*863 ~ 3.6 eV; velocity-Verlet + MTK
    # chains at dt=1 fs hold H to ~1e-4 eV here (measured ~2e-5); a broken
    # half-step order or chain mass drifts H by O(0.1 eV) over 2000 steps
    assert max(drifts) < 2e-3, f"NVT conserved-quantity drift {max(drifts)}"


def test_nvt_controls_temperature(aeam_file):
    """Thermostat drives a cold Al cell toward the target temperature."""
    from lammps_plugins_tpu.potentials.aeam import AEAM
    from lammps_plugins_tpu.core.lattice import Lattice, create_atoms_box

    pair = AEAM.from_file(aeam_file, ["Al", "Si"])
    a = 4.045
    lat = Lattice.fcc(a)
    box = Box.orthogonal([a * 2] * 3)
    pos, types = create_atoms_box(lat, box, [1, 1, 1, 1])
    state = State.create(x=jnp.asarray(pos), type=types, box=box,
                         mass=pair.masses)
    state = velocity_create(state, units.METAL, 100.0, seed=77)
    eng = Engine(state, pair, [FixNVT(400.0, 400.0, 0.1)], units.METAL,
                 check_every=50)
    rows = eng.run(1500, thermo_every=500)
    temps = [r["temp"] for r in rows]
    assert abs(temps[0] - 100.0) < 1.0          # exact-rescale start
    # thermostat must pull the kinetic temperature up toward the target
    # (equipartition alone would drag the cold lattice toward ~50 K)
    assert temps[-1] > 280.0
    assert temps[-1] < 600.0
