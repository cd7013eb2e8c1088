"""Per-atom energy tallies (eatom) and compute/dump/group plumbing."""

import numpy as np
import jax.numpy as jnp

from lammps_plugins_tpu.api.scenes import rebomos_bulk
from lammps_plugins_tpu.core.box import Box
from lammps_plugins_tpu.core.lattice import Lattice, create_atoms_box
from lammps_plugins_tpu.neighbor.build import build_neighbor_data
from lammps_plugins_tpu.potentials.aeam import AEAM
from lammps_plugins_tpu.potentials.rebomos import REBOMoS


def test_rebomos_peratom_sums_to_total(rebo_file):
    state = rebomos_bulk()
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    nbr = build_neighbor_data(state.x, np.asarray(state.type), state.box,
                              pair.neighbor_requests(), skin=2.0)
    E = pair.energy(state.x, jnp.zeros((3, 3)), state.type, nbr,
                    state.box.h)
    eat = pair.energy_peratom(state.x, state.type, nbr, state.box.h)
    assert abs(float(jnp.sum(eat)) - float(E)) < 1e-8 * abs(float(E))
    # bulk crystal: per-species energies cluster (the box is slightly
    # incommensurate with the lattice, so boundary strain spreads them at
    # the 1e-3 level — see SURVEY lattice notes)
    t = np.asarray(state.type)
    eat = np.asarray(eat)
    assert np.std(eat[t == 1]) < 0.01
    assert np.std(eat[t == 2]) < 0.01


def test_aeam_peratom_reference_third_quirk(aeam_file):
    """AEAM eatom gives angular atoms only F/3 (pair_aeam.cpp:299), so the
    per-atom sum deliberately differs from the global energy by 2F_Si/3 —
    replicate exactly."""
    pair = AEAM.from_file(aeam_file, ["Al", "Si"])
    lat = Lattice.fcc(4.045)
    box = Box.orthogonal([4.045 * 3] * 3)
    pos, types = create_atoms_box(lat, box, [1, 1, 1, 1])
    types = np.asarray(types).copy()
    types[7] = 2
    x = jnp.asarray(pos)
    nbr = build_neighbor_data(x, types, box, pair.neighbor_requests(),
                              skin=1.0)
    tt = jnp.asarray(types)
    E = pair.energy(x, jnp.zeros((3, 3)), tt, nbr, box.h)
    eat = np.asarray(pair.energy_peratom(x, tt, nbr, box.h))
    # pure-Al atoms: sum(eatom) == E would hold; with one Si the difference
    # is exactly 2/3 of that atom's embedding energy (positive quantity)
    diff = float(E) - eat.sum()
    assert abs(diff) > 1e-6          # the quirk is present
    # cross-check: with NO angular atoms the tallies must agree exactly
    types_al = np.ones_like(types)
    ttl = jnp.asarray(types_al)
    nbr2 = build_neighbor_data(x, types_al, box, pair.neighbor_requests(),
                               skin=1.0)
    E2 = pair.energy(x, jnp.zeros((3, 3)), ttl, nbr2, box.h)
    eat2 = np.asarray(pair.energy_peratom(x, ttl, nbr2, box.h))
    assert abs(float(E2) - eat2.sum()) < 1e-9 * abs(float(E2))


def test_script_compute_peratom_dump(tmp_path, monkeypatch, rebo_file):
    monkeypatch.chdir("/root/reference/USER-REBOMOS")
    from lammps_plugins_tpu.api.script import Script
    dump = str(tmp_path / "pe.dump")
    text = open("in.rebomos-bulk").read().replace("run 20", "run 10")
    text = text.replace(
        "#dump 1 all atom 10 MoS.lammpstrj",
        f"compute 1 all pe/atom\ndump 1 all custom 10 {dump} id type c_1")
    s = Script(log=lambda _: None)
    s.run_text(text)
    lines = open(dump).read().splitlines()
    hdr = [i for i, ln in enumerate(lines)
           if ln.startswith("ITEM: ATOMS")][0]
    vals = np.array([float(ln.split()[2])
                     for ln in lines[hdr + 1:hdr + 289]])
    assert abs(vals.sum() - -2061.6112) < 1e-3


def test_group_scoped_dump_and_compute(tmp_path, monkeypatch, rebo_file):
    """`dump ID <group> ...` writes only group atoms (global ids kept) and
    `compute ID <group> pe/atom` zeroes non-members — LAMMPS group
    semantics for the output plumbing."""
    monkeypatch.chdir("/root/reference/USER-REBOMOS")
    from lammps_plugins_tpu.api.script import Script
    dump = str(tmp_path / "grp.dump")
    text = open("in.rebomos-bulk").read().replace("run 20", "run 0")
    text = text.replace(
        "#dump 1 all atom 10 MoS.lammpstrj",
        "group sulfur type 2\ncompute 1 sulfur pe/atom\n"
        f"dump 1 sulfur custom 10 {dump} id type c_1")
    s = Script(log=lambda _: None)
    s.run_text(text)
    lines = open(dump).read().splitlines()
    natoms = int(lines[lines.index("ITEM: NUMBER OF ATOMS") + 1])
    t = np.asarray(s.types)
    assert natoms == int((t == 2).sum()) < len(t)
    hdr = [i for i, ln in enumerate(lines)
           if ln.startswith("ITEM: ATOMS")][0]
    rows = [ln.split() for ln in lines[hdr + 1:hdr + 1 + natoms]]
    assert all(r[1] == "2" for r in rows)          # sulfur only
    ids = np.array([int(r[0]) for r in rows])
    assert ids.max() > natoms                      # global ids preserved
    vals = np.array([float(r[2]) for r in rows])
    assert np.isfinite(vals).all() and np.abs(vals).max() > 0.1


def test_group_command_and_nve_group(monkeypatch, rebo_file):
    """fix <group> nve integrates only the group; others stay frozen."""
    monkeypatch.chdir("/root/reference/USER-REBOMOS")
    from lammps_plugins_tpu.api.script import Script
    text = open("in.rebomos-bulk").read()
    text = text.replace("fix 1 all nve",
                        "group mobile type 2\nfix 1 mobile nve")
    text = text.replace("run 20", "run 10")
    s = Script(log=lambda _: None)
    s.run_text(text)
    x0, _ = s.engine.state.box.wrap_np(
        np.asarray(s._state().x))  # original positions (wrapped)
    x1 = np.asarray(s.engine.state.x)
    t = np.asarray(s.types)
    moved = np.abs(x1 - x0).max(axis=1)
    assert moved[t == 1].max() < 1e-12     # Mo frozen
    assert moved[t == 2].max() > 1e-4      # S integrated
