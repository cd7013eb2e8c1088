"""Input-script interpreter (L5 DSL) tests against the reference inputs."""

import numpy as np
import pytest

from lammps_plugins_tpu.api.script import Script, ScriptError

REBOMOS_DIR = "/root/reference/USER-REBOMOS"
AEAM_DIR = "/root/reference/USER-AEAM"


def test_rebomos_bulk_input_reproduces_golden(monkeypatch):
    """Run the reference's own in.rebomos-bulk text; thermo must match
    log.rebomos-bulk.1:54-56."""
    monkeypatch.chdir(REBOMOS_DIR)
    lines = []
    s = Script(log=lines.append)
    s.run_file("in.rebomos-bulk")
    rows = s.last_rows
    assert [r["step"] for r in rows] == [0, 10, 20]
    assert abs(rows[0]["pe"] - -2061.6112) < 5e-4
    assert abs(rows[1]["temp"] - 80.776057) < 5e-6
    assert abs(rows[2]["press"] - -20669.371) < 5e-3
    assert any("Created 288 atoms" in ln for ln in lines)


def test_sample_in_scaled(monkeypatch):
    """sample.in (scaled down) runs end-to-end: NVT + velocity create +
    type/fraction + AEAM."""
    monkeypatch.chdir(AEAM_DIR)
    text = open("sample.in").read()
    text = text.replace("block 0 20 0 20 0 20", "block 0 4 0 4 0 4")
    text = text.replace("run             400", "run 5")
    text = text.replace("thermo          100", "thermo 5")
    s = Script(log=lambda _: None)
    s.run_text(text)
    rows = s.last_rows
    assert len(rows) == 2
    t = np.asarray(s.types)
    assert len(t) == 4 * 64
    assert abs(rows[0]["temp"] - 863.0) < 1e-6      # velocity create exact
    # AEAM cohesive energy sanity
    assert -4.0 < rows[0]["pe"] / len(t) < -3.0


def test_dollar_expression_substitution():
    s = Script(log=lambda _: None)
    assert s._substitute("basis $(3.0/4.0) x") == "basis 0.75 x"
    assert s._substitute("a $(2.0/3.0)") == f"a {2.0/3.0!r}"


def test_variable_substitution():
    s = Script(log=lambda _: None)
    s.command("variable x equal 5.0")
    assert s._substitute("run ${x}") == "run 5.0"


def test_unknown_command_raises():
    s = Script(log=lambda _: None)
    with pytest.raises(ScriptError):
        s.command("frobnicate 1 2 3")


def test_noop_commands_warn():
    s = Script(log=lambda _: None)
    with pytest.warns(UserWarning):
        s.command("processors 2 2 1")


def test_line_continuation():
    s = Script(log=lambda _: None)
    s.run_text("variable y &\n equal 3.0\n")
    assert s.variables["y"] == "3.0"


def test_plugin_load_registers_styles(tmp_path):
    """`plugin load file.py` — import-time decorator registration, the
    analogue of the reference's lammpsplugin_init protocol."""
    from lammps_plugins_tpu.api.script import Script
    from lammps_plugins_tpu import registry

    plug = tmp_path / "my_plugin.py"
    plug.write_text(
        "from lammps_plugins_tpu.registry import register_fix_style\n"
        "from lammps_plugins_tpu.fixes.nve import FixNVE\n"
        "@register_fix_style('nve_custom_test')\n"
        "class FixNVECustom(FixNVE):\n"
        "    pass\n")
    s = Script()
    s.run_text(f"plugin load {plug}\nplugin list\n")
    assert "nve_custom_test" in registry.FIX_STYLES
    del registry.FIX_STYLES["nve_custom_test"]


def test_bfield_ordering_enforced(monkeypatch):
    """fix bfield must precede the time integrator and the integrator must
    be NVE-style (fix_bfield.cpp:206-219)."""
    monkeypatch.chdir(AEAM_DIR)
    base = """
units metal
atom_style charge
boundary p p p
lattice fcc 4.05
region box block 0 2 0 2 0 2
create_box 1 box
create_atoms 1 box
mass 1 26.98
pair_style aeam
pair_coeff * * AlSi.aeam Al
"""
    # integrator defined before bfield -> error
    s = Script(log=lambda _: None)
    s.run_text(base + "fix 1 all nve\nfix 2 all bfield 0 0 5.0\n")
    with pytest.raises(ScriptError, match="must be defined before"):
        s.command("run 1")
    # NVT integrator with bfield -> error
    s = Script(log=lambda _: None)
    s.run_text(base
               + "fix 1 all bfield 0 0 5.0\nfix 2 all nvt temp 300 300 0.1\n")
    with pytest.raises(ScriptError, match="NVE style integrator"):
        s.command("run 1")
