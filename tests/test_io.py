"""Checkpoint/resume, dump files, and timing observability."""

import os

import numpy as np
import jax.numpy as jnp

from lammps_plugins_tpu.api.scenes import rebomos_bulk
from lammps_plugins_tpu.core import units
from lammps_plugins_tpu.fixes.nve import FixNVE
from lammps_plugins_tpu.fixes.nvt import FixNVT
from lammps_plugins_tpu.fixes.velocity import velocity_create
from lammps_plugins_tpu.potentials.rebomos import REBOMoS
from lammps_plugins_tpu.run.checkpoint import load_state, save_state
from lammps_plugins_tpu.run.dump import DumpWriter
from lammps_plugins_tpu.run.simulation import Engine


def test_checkpoint_roundtrip_resumes_exactly(tmp_path, rebo_file):
    """Run 10 steps, checkpoint, run 10 more; resume from the checkpoint
    must land at bitwise-identical positions (restartinfo=0 semantics:
    only dynamical state persists)."""
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    state = velocity_create(rebomos_bulk(), units.METAL, 100.0, seed=9)

    eng = Engine(state, pair, [FixNVE()], units.METAL, check_every=10)
    eng.run(10)
    path = str(tmp_path / "ck.npz")
    save_state(path, eng.state)
    eng.run(10)
    x_ref = np.asarray(eng.state.x)

    st2 = load_state(path)
    assert int(st2.step) == 10
    eng2 = Engine(st2, pair, [FixNVE()], units.METAL, check_every=10)
    eng2.run(10)
    # the resumed engine re-wraps coordinates at its setup rebuild, which
    # perturbs x by one ulp; beyond that the trajectories are identical
    np.testing.assert_allclose(np.asarray(eng2.state.x), x_ref,
                               rtol=0, atol=1e-12)


def test_checkpoint_preserves_nvt_chain(tmp_path, rebo_file):
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    state = velocity_create(rebomos_bulk(), units.METAL, 50.0, seed=4)
    fix = FixNVT(300.0, 300.0, 0.1)
    eng = Engine(state, pair, [fix], units.METAL, check_every=10)
    eng.run(10)
    path = str(tmp_path / "ck.npz")
    save_state(path, eng.state)
    st2 = load_state(path)
    chain = st2.extras["nvt:nvt"]
    np.testing.assert_array_equal(
        np.asarray(chain["eta"]),
        np.asarray(eng.state.extras["nvt:nvt"]["eta"]))
    assert float(np.abs(np.asarray(chain["eta_dot"])).max()) > 0


def test_dump_atom_format(tmp_path, rebo_file):
    state = rebomos_bulk()
    path = str(tmp_path / "traj.dump")
    w = DumpWriter(path, columns=["id", "type", "x", "y", "z", "ix", "iy",
                                  "iz"])
    w.write(state)
    w.close()
    lines = open(path).read().splitlines()
    assert lines[0] == "ITEM: TIMESTEP" and lines[1] == "0"
    assert lines[2] == "ITEM: NUMBER OF ATOMS" and lines[3] == "288"
    assert lines[4].startswith("ITEM: BOX BOUNDS xy xz yz pp pp pp")
    assert lines[8] == "ITEM: ATOMS id type x y z ix iy iz"
    first = lines[9].split()
    assert first[0] == "1" and first[1] in ("1", "2")
    assert len(lines) == 9 + 288


def test_timing_summary(rebo_file):
    pair = REBOMoS.from_file(rebo_file, ["M", "S"])
    eng = Engine(rebomos_bulk(), pair, [FixNVE()], units.METAL)
    eng.run(5)
    rep = eng.timers.performance_summary(0.001)
    assert "katom-step/s" in rep and "Pair" in rep and "ns/day" in rep


def test_script_dump_and_restart(tmp_path, monkeypatch, rebo_file):
    monkeypatch.chdir("/root/reference/USER-REBOMOS")
    from lammps_plugins_tpu.api.script import Script
    dump = str(tmp_path / "mos.dump")
    ck = str(tmp_path / "mos.restart.npz")
    text = open("in.rebomos-bulk").read()
    text = text.replace("#dump 1 all atom 10 MoS.lammpstrj",
                        f"dump 1 all atom 10 {dump}")
    text += f"\nwrite_restart {ck}\n"
    s = Script(log=lambda _: None)
    s.run_text(text)
    assert os.path.exists(dump)
    frames = open(dump).read().count("ITEM: TIMESTEP")
    assert frames == 3            # steps 0, 10, 20
    st = load_state(ck)
    assert int(st.step) == 20 and st.natoms == 288


def test_script_periodic_restart(tmp_path, monkeypatch, rebo_file):
    """`restart N file*` writes step-stamped checkpoints during the run
    (sample.in:23 semantics) that resume exactly."""
    monkeypatch.chdir("/root/reference/USER-REBOMOS")
    from lammps_plugins_tpu.api.script import Script
    root = str(tmp_path / "mos.rst.*")
    text = open("in.rebomos-bulk").read()
    text = text.replace("fix 1 all nve", f"restart 10 {root}\nfix 1 all nve")
    s = Script(log=lambda _: None)
    s.run_text(text)
    f10 = str(tmp_path / "mos.rst.10")
    f20 = str(tmp_path / "mos.rst.20")
    assert os.path.exists(f10) and os.path.exists(f20)
    assert not os.path.exists(str(tmp_path / "mos.rst.0"))
    st = load_state(f20)
    np.testing.assert_allclose(np.asarray(st.x),
                               np.asarray(s.engine.state.x), atol=0)
    assert int(load_state(f10).step) == 10
