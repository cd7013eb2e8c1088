"""Engine driver — fused velocity-Verlet step with ordered fix hooks.

The per-step pipeline mirrors Verlet::run (SURVEY.md section 3.1):

    initial_integrate (all fixes, definition order)
    post_integrate
    [neighbor rebuild decision — host side, amortized]
    force/energy/virial evaluation (pair style, one fused autodiff pass)
    post_force
    final_integrate
    end_of_step

The whole step is one jit-compiled pure function  (State, NeighborData) ->
(State, pe, W); segments of steps run under lax.scan between neighbor
rebuilds.  Rebuild safety is exact: after each segment the half-skin
displacement criterion is re-checked against the segment's start; if it
tripped mid-segment the segment is re-run from the saved state with fresh
lists (bitwise equivalent to checking every step, since list slack does not
change the physics — see neighbor/build.py).

Remote-TPU discipline: every eager jnp op on a tunneled TPU backend costs a
remote compile, so ALL host-loop work here (rebuild checks, wrapping,
thermo bookkeeping) is numpy on pulled arrays or folded into the jitted
step; device code runs only inside jit.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from ..core.units import UnitSystem
from ..fixes.base import Fix, StepContext
from ..neighbor.build import NeighborData, build_neighbor_data
from ..potentials.base import PairStyle
from . import thermo as thermo_mod


class Engine:
    """Owns the jitted step and the host-side rebuild loop."""

    def __init__(self, state: State, pair: PairStyle, fixes: Sequence[Fix],
                 units: UnitSystem, dt: float | None = None,
                 skin: float | None = None, check_every: int = 10):
        self.state = state
        self.pair = pair
        self.fixes = list(fixes)
        self.units = units
        self.ctx = StepContext(units=units, dt=dt if dt is not None
                               else units.dt)
        self.skin = skin if skin is not None else units.skin
        self.check_every = check_every
        self.nbr: NeighborData | None = None
        self._x_build_np: np.ndarray | None = None
        self.thermo_rows: List[dict] = []
        self._seg_jit = None
        self._efv_jit = None
        self._thermo_jit = None

        for fix in self.fixes:
            self.state = fix.setup(self.state, self.ctx)

    # -- neighbor maintenance (host side, numpy) ---------------------------
    def _needs_rebuild(self, x_np: np.ndarray) -> bool:
        if self._x_build_np is None:
            return True
        d = x_np - self._x_build_np
        return bool((d * d).sum(axis=1).max() > (0.5 * self.skin) ** 2)

    def rebuild_neighbors(self, x_np: np.ndarray | None = None):
        if x_np is None:
            x_np = np.asarray(self.state.x)
        xw, image = self.state.box.wrap_np(x_np, np.asarray(self.state.image))
        dtype = self.state.x.dtype
        self.state = self.state.replace(x=jnp.asarray(xw, dtype),
                                        image=jnp.asarray(image))
        self.nbr = build_neighbor_data(
            xw, np.asarray(self.state.type), self.state.box,
            self.pair.neighbor_requests(), skin=self.skin, dtype=dtype)
        self._x_build_np = xw

    # -- jitted computations ----------------------------------------------
    def _one_step(self, state: State, nbr: NeighborData):
        ctx = self.ctx
        for f in self.fixes:
            state = f.initial_integrate(state, ctx)
        for f in self.fixes:
            state = f.post_integrate(state, ctx)
        pe, force, W = self.pair.energy_force_virial(
            state.x, state.type, nbr, state.box.h)
        state = state.replace(f=force)
        for f in self.fixes:
            state = f.post_force(state, ctx)
        for f in self.fixes:
            state = f.final_integrate(state, ctx)
        for f in self.fixes:
            state = f.end_of_step(state, ctx)
        state = state.replace(step=state.step + 1)
        return state, pe, W

    def _segment(self, state, nbr, nsteps: int):
        """Run `nsteps` fused steps on device. Compiled once per nsteps."""
        if self._seg_jit is None:
            def seg(state, nbr, nsteps):
                def body(carry, _):
                    st, _, _ = carry
                    st, pe, W = self._one_step(st, nbr)
                    return (st, pe, W), None

                zero = jnp.zeros((), state.x.dtype)
                w0 = jnp.zeros((3, 3), state.x.dtype)
                (st, pe, W), _ = jax.lax.scan(
                    body, (state, zero, w0), None, length=nsteps)
                # max displacement^2 vs list-build positions, for the
                # host-side rebuild decision without an extra eager op
                d = st.x - nbr.x_build
                maxdisp_sq = jnp.max(jnp.sum(d * d, axis=-1))
                return st, pe, W, maxdisp_sq

            self._seg_jit = jax.jit(seg, static_argnums=2)
        return self._seg_jit(state, nbr, nsteps)

    def evaluate(self):
        """Compute forces/pe/W at the current positions (LAMMPS setup())."""
        x_np = np.asarray(self.state.x)
        if self.nbr is None or self._needs_rebuild(x_np):
            self.rebuild_neighbors(x_np)
        if self._efv_jit is None:
            self._efv_jit = jax.jit(self.pair.energy_force_virial)
        pe, force, W = self._efv_jit(
            self.state.x, self.state.type, self.nbr, self.state.box.h)
        self.state = self.state.replace(f=force)
        return pe, W

    def _thermo(self, state, pe, W):
        if self._thermo_jit is None:
            def th(state, pe, W):
                row = thermo_mod.thermo_row(state, pe, W, self.units)
                # angles/volume are step-constant; drop device recompute
                for k in ("cellalpha", "cellbeta", "cellgamma", "vol"):
                    row.pop(k)
                return row

            self._thermo_jit = jax.jit(th)
        row = jax.device_get(self._thermo_jit(state, pe, W))
        row = {k: (int(v) if k == "step" else float(v))
               for k, v in row.items()}
        alpha, beta, gamma = state.box.cell_angles_deg_np()
        h = state.box.h_np()
        row["cellalpha"], row["cellbeta"], row["cellgamma"] = alpha, beta, gamma
        row["vol"] = float(abs(np.linalg.det(h)))
        return row

    # -- main loop ----------------------------------------------------------
    def run(self, nsteps: int, thermo_every: int = 0,
            on_thermo: Callable[[dict], None] | None = None):
        """Run `nsteps`; collect thermo rows every `thermo_every` steps
        (including step 0, like LAMMPS)."""
        pe, W = self.evaluate()
        rows = []

        def emit():
            row = self._thermo(self.state, pe, W)
            rows.append(row)
            if on_thermo:
                on_thermo(row)

        if thermo_every:
            emit()

        half_skin_sq = (0.5 * self.skin) ** 2
        done = 0
        while done < nsteps:
            seg = min(self.check_every, nsteps - done)
            if thermo_every:
                to_thermo = thermo_every - (done % thermo_every)
                seg = min(seg, to_thermo)

            start_state = self.state
            new_state, pe, W, maxdisp_sq = self._segment(
                self.state, self.nbr, seg)

            if float(maxdisp_sq) > half_skin_sq:
                # mid-segment half-skin violation possible: redo exactly
                self.state = start_state
                self.rebuild_neighbors()
                new_state, pe, W, maxdisp_sq = self._segment(
                    self.state, self.nbr, seg)
                self.state = new_state
                if float(maxdisp_sq) > half_skin_sq:
                    # moved > skin/2 within one fresh segment; rebuild so
                    # the *next* segment starts valid
                    self.rebuild_neighbors()
            else:
                self.state = new_state

            done += seg
            if thermo_every and done % thermo_every == 0:
                emit()

        self.thermo_rows = rows
        return rows
