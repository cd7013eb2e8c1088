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


# ---------------------------------------------------------------------------
# per-atom virial (vatom / compute stress/atom) — VERDICT r4 item 7
# ---------------------------------------------------------------------------

_W6 = [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]


def _assert_vatom_sums_to_W(pair, state, nbr, rel=1e-8):
    E, W = pair.energy_virial(state.x, state.type, nbr, state.box.h)
    vat = pair.virial_peratom(state.x, state.type, nbr, state.box.h)
    tot = np.asarray(jnp.sum(vat, axis=0))
    W = np.asarray(W)
    scale = max(1.0, np.abs(W).max())
    for k, (a, b) in enumerate(_W6):
        assert abs(tot[k] - W[a, b]) < rel * scale, \
            (k, tot[k], W[a, b])
    # physical symmetry of the summed tensor
    assert abs(W[0, 1] - W[1, 0]) < 1e-6 * scale
    return vat


def test_rebomos_vatom_sums_to_global_virial(rebo_file):
    """Sum of per-atom virial == strain-derivative virial, both tiers
    (REBO via edge cotangents, LJ via the master list)."""
    state = rebomos_bulk()
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    nbr = build_neighbor_data(state.x, np.asarray(state.type), state.box,
                              pair.neighbor_requests(), skin=2.0)
    vat = _assert_vatom_sums_to_W(pair, state, nbr)
    # bulk crystal: values are finite and nonzero
    assert np.isfinite(np.asarray(vat)).all()
    assert np.abs(np.asarray(vat)[:, 0]).max() > 1e-3


def test_rebomos_vatom_cells_path(rebo_file):
    """Same identity through the production cell-decomposition LJ tier
    (device rebuild: no master list, nbr.cells set)."""
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.run.simulation import Engine
    state = rebomos_bulk()
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    eng = Engine(state, pair, [FixNVE()], units.METAL,
                 device_rebuild=True)
    eng.rebuild_neighbors()
    assert eng.nbr.cells is not None
    assert "master" not in eng.nbr.lists
    _assert_vatom_sums_to_W(pair, eng.state, eng.nbr)


def test_aeam_vatom_sums_to_global_virial(aeam_file):
    pair = AEAM.from_file(aeam_file, ["Al", "Si"])
    lat = Lattice.fcc(4.045)
    box = Box.orthogonal([4.045 * 3] * 3)
    pos, types = create_atoms_box(lat, box, [1, 1, 1, 1])
    types = np.asarray(types).copy()
    types[7] = 2                               # one angular Si center
    x = jnp.asarray(pos) + 0.03 * np.sin(
        np.arange(pos.shape[0] * 3)).reshape(-1, 3)   # break symmetry
    tt = jnp.asarray(types)
    pair.prepare(types)
    nbr = build_neighbor_data(x, types, box, pair.neighbor_requests(),
                              skin=1.0)

    class _S:                                  # minimal state view
        pass
    st = _S()
    st.x, st.type = x, tt
    st.box = box
    _assert_vatom_sums_to_W(pair, st, nbr)


def test_ljcut_vatom_sums_to_global_virial():
    from lammps_plugins_tpu.potentials.ljcut import PairLJCut
    pair = PairLJCut(2.5, ntypes=1)
    pair.set_coeff(1, 1, 1.0, 1.0)
    rng = np.random.default_rng(7)
    box = Box.orthogonal([6.0, 6.0, 6.0])
    x = jnp.asarray(rng.uniform(0.3, 5.7, (40, 3)))
    types = np.ones(40, np.int32)
    nbr = build_neighbor_data(x, types, box, pair.neighbor_requests(),
                              skin=0.5)

    class _S:
        pass
    st = _S()
    st.x, st.type, st.box = x, jnp.asarray(types), box
    _assert_vatom_sums_to_W(pair, st, nbr)


def test_script_compute_stress_atom(tmp_path, monkeypatch, rebo_file):
    """compute stress/atom + dump custom c_1[1..6]: the negative trace sum
    over atoms equals 3 P V (ComputeStressAtom's pressure identity)."""
    monkeypatch.chdir("/root/reference/USER-REBOMOS")
    from lammps_plugins_tpu.api.script import Script
    dump = str(tmp_path / "stress.dump")
    lines_out = []
    text = open("in.rebomos-bulk").read().replace("run 20", "run 10")
    text = text.replace(
        "#dump 1 all atom 10 MoS.lammpstrj",
        "compute 1 all stress/atom NULL\n"
        f"dump 1 all custom 10 {dump} id c_1[1] c_1[2] c_1[3] "
        "c_1[4] c_1[5] c_1[6]")
    text = text.replace("thermo_style custom",
                        "thermo_style custom press vol")
    s = Script(log=lines_out.append)
    s.run_text(text)
    rows = [ln.split() for ln in lines_out
            if ln.strip() and not ln.lstrip().startswith(("P", "S"))
            and ln.split()[0].replace(".", "").replace("-", "")
            .replace("e", "").replace("+", "").isdigit()]
    # last thermo row: press, vol are the first two columns
    press, vol = float(rows[-1][0]), float(rows[-1][1])
    dlines = open(dump).read().splitlines()
    hdrs = [i for i, ln in enumerate(dlines)
            if ln.startswith("ITEM: ATOMS")]
    hdr = hdrs[-1]                              # final frame
    vals = np.array([[float(v) for v in ln.split()[1:7]]
                     for ln in dlines[hdr + 1:hdr + 289]])
    # -(sum_i trace(S_i))/3V == press (bar)
    p_from_stress = -vals[:, :3].sum() / (3.0 * vol)
    assert abs(p_from_stress - press) < 1e-4 * max(1.0, abs(press))
