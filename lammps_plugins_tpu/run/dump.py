"""Trajectory dump files — LAMMPS text dump format.

Supports the styles the reference inputs reference (sample.in:21 uses
`dump custom` with id/type/x/y/z/ix/iy/iz; in.rebomos-bulk:32 `dump atom`):
  * atom:   id type xs ys zs        (scaled coordinates)
  * custom: user-selected columns from id, type, x, y, z, xs, ys, zs,
            ix, iy, iz, vx, vy, vz, fx, fy, fz, q
Triclinic boxes emit the xy/xz/yz bounds header LAMMPS tools expect.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..core.state import State


class DumpWriter:
    def __init__(self, path: str, columns: Sequence[str] = ("id", "type",
                                                            "xs", "ys", "zs"),
                 append: bool = False, providers=None, group_mask=None):
        """providers: optional {column_name: fn(state) -> [N] array} for
        computed columns (e.g. c_1 for `compute 1 all pe/atom`).
        group_mask: optional [N] bool — only those atoms are written
        (LAMMPS `dump ID group-ID ...` semantics); atom ids stay global."""
        self.path = path
        self.columns = list(columns)
        self.providers = dict(providers or {})
        self.group_mask = (None if group_mask is None
                           else np.asarray(group_mask, bool))
        self._fh = open(path, "a" if append else "w")

    def close(self):
        self._fh.close()

    def __call__(self, state: State):
        self.write(state)

    def write(self, state: State):
        x = np.asarray(state.x)
        n = len(x)
        h = state.box.h_np()
        lo = state.box.lo_np()
        xy, xz, yz = h[1, 0], h[2, 0], h[2, 1]
        triclinic = any(abs(v) > 0 for v in (xy, xz, yz))
        f = (x - lo) @ np.linalg.inv(h)

        vals = {}
        for c in self.columns:
            if c == "id":
                vals[c] = np.arange(1, n + 1)
            elif c == "type":
                vals[c] = np.asarray(state.type)
            elif c in ("x", "y", "z"):
                vals[c] = x[:, "xyz".index(c)]
            elif c in ("xs", "ys", "zs"):
                vals[c] = f[:, "xyz".index(c[0])]
            elif c in ("ix", "iy", "iz"):
                vals[c] = np.asarray(state.image)[:, "xyz".index(c[1])]
            elif c in ("vx", "vy", "vz"):
                vals[c] = np.asarray(state.v)[:, "xyz".index(c[1])]
            elif c in ("fx", "fy", "fz"):
                vals[c] = np.asarray(state.f)[:, "xyz".index(c[1])]
            elif c == "q":
                vals[c] = np.asarray(state.q)
            elif c in self.providers:
                vals[c] = np.asarray(self.providers[c](state))
            else:
                raise ValueError(f"Unknown dump column {c!r}")

        if self.group_mask is not None:
            sel = self.group_mask
            vals = {c: v[sel] for c, v in vals.items()}
            n = int(sel.sum())

        out: List[str] = []
        out.append("ITEM: TIMESTEP")
        out.append(str(int(state.step)))
        out.append("ITEM: NUMBER OF ATOMS")
        out.append(str(n))
        per = "".join("p" if p else "f" for p in state.box.periodic)
        bper = " ".join(2 * c for c in per)
        if triclinic:
            # LAMMPS bound convention for triclinic dumps
            xlo_b = lo[0] + min(0.0, xy, xz, xy + xz)
            xhi_b = lo[0] + h[0, 0] + max(0.0, xy, xz, xy + xz)
            ylo_b = lo[1] + min(0.0, yz)
            yhi_b = lo[1] + h[1, 1] + max(0.0, yz)
            out.append(f"ITEM: BOX BOUNDS xy xz yz {bper}")
            out.append(f"{xlo_b:.16g} {xhi_b:.16g} {xy:.16g}")
            out.append(f"{ylo_b:.16g} {yhi_b:.16g} {xz:.16g}")
            out.append(f"{lo[2]:.16g} {lo[2] + h[2, 2]:.16g} {yz:.16g}")
        else:
            out.append(f"ITEM: BOX BOUNDS {bper}")
            for d in range(3):
                out.append(f"{lo[d]:.16g} {lo[d] + h[d, d]:.16g}")
        out.append("ITEM: ATOMS " + " ".join(self.columns))
        cols = [vals[c] for c in self.columns]
        for i in range(n):
            out.append(" ".join(
                str(int(v[i])) if np.issubdtype(v.dtype, np.integer)
                else f"{v[i]:.8g}" for v in cols))
        self._fh.write("\n".join(out) + "\n")
        self._fh.flush()
