"""MoS2 monolayer slab scene (BASELINE.json config 4, scaled down for CPU).

Oracles: the monolayer is a true isolated layer (no cross-vacuum
interactions), its per-atom energy sits in the physical range of the bulk
phase, and NVE on the thermalized slab conserves energy through neighbor
rebuilds.
"""

import numpy as np
import jax.numpy as jnp

from lammps_plugins_tpu.api.scenes import rebomos_monolayer
from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.fixes.nve import FixNVE
from lammps_plugins_tpu.fixes.velocity import velocity_create
from lammps_plugins_tpu.potentials.rebomos import REBOMoS
from lammps_plugins_tpu.run.simulation import Engine

from conftest import REBO_FILE


def test_monolayer_isolated_from_z_images():
    """Doubling the vacuum must not change the energy at all — the layer
    never sees its periodic z-images."""
    pair = REBOMoS.from_file(REBO_FILE, ["M", "S"])
    es = []
    for vac in (16.0, 40.0):
        st = rebomos_monolayer(nx=4, ny=4, vacuum=vac, dtype=jnp.float64)
        eng = Engine(st, pair, [FixNVE()], units.METAL)
        pe, _ = eng.evaluate()
        es.append(float(pe))
    assert es[0] != 0.0
    np.testing.assert_allclose(es[0], es[1], rtol=1e-12)


def test_monolayer_energy_scale():
    """PE/atom of the relaxed monolayer lattice is near the bulk cohesive
    scale (each bulk layer is vdW-bound only, so the difference is small:
    the golden bulk runs at -7.158 eV/atom, log.rebomos-bulk.1:54)."""
    pair = REBOMoS.from_file(REBO_FILE, ["M", "S"])
    st = rebomos_monolayer(nx=6, ny=6, dtype=jnp.float64)
    assert st.natoms == 6 * 6 * 3
    eng = Engine(st, pair, [FixNVE()], units.METAL)
    pe, _ = eng.evaluate()
    per_atom = float(pe) / st.natoms
    assert -7.4 < per_atom < -6.8


def test_monolayer_nve_conservation_through_rebuilds():
    pair = REBOMoS.from_file(REBO_FILE, ["M", "S"])
    st = rebomos_monolayer(nx=5, ny=6, dtype=jnp.float64)
    st = velocity_create(st, units.METAL, 300.0, seed=99)
    eng = Engine(st, pair, [FixNVE()], units.METAL, skin=1.0,
                 check_every=5)
    rows = eng.run(60, thermo_every=30)
    e = [r["etotal"] for r in rows]
    assert rows[-1]["step"] == 60
    drift = abs(e[-1] - e[0]) / st.natoms
    assert drift < 2e-5          # eV/atom over 60 fs
    assert all(np.isfinite(r["press"]) for r in rows)
