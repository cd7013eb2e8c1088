"""Checkpoint / resume — persistence of the State pytree.

The reference pair styles opt out of restart data (restartinfo=0,
pair_aeam.cpp:38, pair_rebomos.cpp:60), so a checkpoint is exactly the
dynamical state: x, v, type, q, image, mass, box, step (+ fix extras such
as Nose-Hoover chain variables).  Potentials are re-derived from their
parameter files on resume, matching the reference's model.

Format: a single .npz (portable, dependency-free).  Fix extras are stored
under flattened "extras/<key>/<field>" names.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.box import Box
from ..core.state import State


def save_state(path: str, state: State) -> None:
    data = {
        "x": np.asarray(state.x), "v": np.asarray(state.v),
        "f": np.asarray(state.f), "type": np.asarray(state.type),
        "q": np.asarray(state.q), "image": np.asarray(state.image),
        "mass": np.asarray(state.mass), "step": np.asarray(state.step),
        "box_h": state.box.h_np(), "box_lo": state.box.lo_np(),
        "box_periodic": np.asarray(state.box.periodic),
    }
    for key, sub in state.extras.items():
        if isinstance(sub, dict):
            for field, val in sub.items():
                data[f"extras/{key}/{field}"] = np.asarray(val)
        else:
            data[f"extras/{key}"] = np.asarray(sub)
    with open(path, "wb") as fh:        # exact filename (np.savez would
        np.savez(fh, **data)            # append ".npz" to a bare path)


def load_state(path: str, dtype=jnp.float64) -> State:
    z = np.load(path, allow_pickle=False)
    box = Box(h=jnp.asarray(z["box_h"], dtype),
              lo=jnp.asarray(z["box_lo"], dtype),
              periodic=tuple(bool(p) for p in z["box_periodic"]),
              h64=Box._master(z["box_h"]), lo64=Box._master(z["box_lo"]))
    extras: dict = {}
    for name in z.files:
        if not name.startswith("extras/"):
            continue
        parts = name.split("/")
        val = jnp.asarray(z[name])
        if len(parts) == 3:
            extras.setdefault(parts[1], {})[parts[2]] = val
        else:
            extras[parts[1]] = val
    st = State(
        x=jnp.asarray(z["x"], dtype), v=jnp.asarray(z["v"], dtype),
        f=jnp.asarray(z["f"], dtype), type=jnp.asarray(z["type"], jnp.int32),
        q=jnp.asarray(z["q"], dtype), image=jnp.asarray(z["image"], jnp.int32),
        mass=jnp.asarray(z["mass"], dtype), box=box,
        step=jnp.asarray(z["step"], jnp.int32), extras=extras)
    return st
