"""Full-scale USER-AEAM/sample.in smoke run on the TPU (f32).

Runs the VERBATIM 32,000-atom deck (fcc Al + 0.75% Si, NVT 863 K, 400
steps, /root/reference/USER-AEAM/sample.in) through the input-script
interpreter and asserts (a) finite energies throughout and (b) the
thermostat regulating T toward 863 K — the reference's own bar is
run-without-crash (README.md:30-33).

Usage: python benchmarks/sample_in_full.py [steps]   (default: the deck's
own 400).  Clean-exit watchdog; never kill externally.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULT = {"metric": "sample.in full-scale smoke (32k atoms, 400 steps)",
          "ok": False}


def _watchdog(seconds):
    time.sleep(seconds)
    print(json.dumps(RESULT), flush=True)
    os._exit(0)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    np.asarray(jax.device_put(np.ones(8, np.float32)))

    from lammps_plugins_tpu.api.script import Script

    os.chdir("/root/reference/USER-AEAM")   # potential file path is relative
    deck = open("sample.in").read()
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else None
    if nsteps is not None:
        import re
        deck = re.sub(r"^run\s+\d+", f"run {nsteps}", deck,
                      flags=re.MULTILINE)

    rows = []

    def log(line):
        print(line, flush=True)

    s = Script(dtype=jnp.float32, log=log)
    t0 = time.time()
    s.run_text(deck)
    wall = time.time() - t0
    rows = s.engine.thermo_rows if s.engine else []
    temps = [r["temp"] for r in rows]
    pes = [r["pe"] for r in rows]
    ok = (len(rows) > 0 and all(np.isfinite(t) for t in temps)
          and all(np.isfinite(p) for p in pes))
    # thermostat regulation: velocity create puts T at 863, equipartition
    # halves it while the lattice disorders, then the Nose-Hoover chain
    # (Tdamp 0.1 ps = 100 steps) pulls it back toward 863
    if temps:
        ok = ok and 430.0 < temps[-1] < 1100.0
    RESULT.update(ok=bool(ok), wall_s=round(wall, 1),
                  t_final=round(temps[-1], 1) if temps else None,
                  pe_final=round(pes[-1], 2) if pes else None,
                  rows=len(rows))
    print(json.dumps(RESULT), flush=True)


if __name__ == "__main__":
    threading.Thread(target=_watchdog,
                     args=(int(os.environ.get("SMOKE_WATCHDOG", 2100)),),
                     daemon=True).start()
    main()
    os._exit(0)
