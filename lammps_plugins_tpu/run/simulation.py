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
"""

from __future__ import annotations

from functools import partial
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
        self.thermo_every = 0
        self.thermo_rows: List[dict] = []
        self._compiled_steps = {}

        for fix in self.fixes:
            self.state = fix.setup(self.state, self.ctx)

    # -- neighbor maintenance ---------------------------------------------
    def rebuild_neighbors(self):
        x_wrapped, image = self.state.box.wrap(self.state.x, self.state.image)
        self.state = self.state.replace(x=x_wrapped, image=image)
        self.nbr = build_neighbor_data(
            self.state.x, np.asarray(self.state.type), self.state.box,
            self.pair.neighbor_requests(), skin=self.skin,
            dtype=self.state.x.dtype)

    # -- single fused step -------------------------------------------------
    def _make_step(self):
        pair, fixes, ctx = self.pair, self.fixes, self.ctx

        def one_step(state: State, nbr: NeighborData):
            for f in fixes:
                state = f.initial_integrate(state, ctx)
            for f in fixes:
                state = f.post_integrate(state, ctx)
            pe, force, W = pair.energy_force_virial(
                state.x, state.type, nbr, state.box.h)
            state = state.replace(f=force)
            for f in fixes:
                state = f.post_force(state, ctx)
            for f in fixes:
                state = f.final_integrate(state, ctx)
            for f in fixes:
                state = f.end_of_step(state, ctx)
            state = state.replace(step=state.step + 1)
            return state, pe, W

        return one_step

    def _segment_fn(self, nsteps: int):
        """jitted: run `nsteps` fused steps, return final state + last pe/W."""
        key = ("seg", nsteps, self._nbr_shape_key())
        if key not in self._compiled_steps:
            one_step = self._make_step()

            @jax.jit
            def seg(state, nbr):
                def body(carry, _):
                    st, _, _ = carry
                    st, pe, W = one_step(st, nbr)
                    return (st, pe, W), None

                zero = jnp.zeros((), state.x.dtype)
                w0 = jnp.zeros((3, 3), state.x.dtype)
                (st, pe, W), _ = jax.lax.scan(
                    body, (state, zero, w0), None, length=nsteps)
                return st, pe, W

            self._compiled_steps[key] = seg
        return self._compiled_steps[key]

    def _nbr_shape_key(self):
        return tuple((n, l.idx.shape) for n, l in sorted(self.nbr.lists.items())) \
            + (self.nbr.ghosts.count,)

    # -- force-only evaluation (setup, thermo) ------------------------------
    def evaluate(self):
        """Compute forces/pe/W at the current positions (LAMMPS setup())."""
        if self.nbr is None or self.nbr.needs_rebuild(self.state.x):
            self.rebuild_neighbors()
        if not hasattr(self, "_efv_jit"):
            self._efv_jit = jax.jit(self.pair.energy_force_virial)
        pe, force, W = self._efv_jit(
            self.state.x, self.state.type, self.nbr, self.state.box.h)
        self.state = self.state.replace(f=force)
        return pe, W

    # -- main loop ----------------------------------------------------------
    def run(self, nsteps: int, thermo_every: int = 0,
            on_thermo: Callable[[dict], None] | None = None):
        """Run `nsteps`; collect thermo rows every `thermo_every` steps
        (including step 0, like LAMMPS)."""
        pe, W = self.evaluate()
        rows = []

        def emit():
            row = thermo_mod.thermo_row(self.state, pe, W, self.units,
                                        fix_energy=0.0)
            row = {k: float(v) if hasattr(v, "item") else v
                   for k, v in row.items()}
            row["step"] = int(row["step"])
            rows.append(row)
            if on_thermo:
                on_thermo(row)

        if thermo_every:
            emit()

        done = 0
        while done < nsteps:
            seg = min(self.check_every, nsteps - done)
            if thermo_every:
                # align segments to thermo boundaries
                to_thermo = thermo_every - (done % thermo_every)
                seg = min(seg, to_thermo)

            start_state = self.state
            seg_fn = self._segment_fn(seg)
            new_state, pe, W = seg_fn(self.state, self.nbr)

            if self.nbr.needs_rebuild(new_state.x):
                # mid-segment half-skin violation possible: redo exactly
                self.state = start_state
                self.rebuild_neighbors()
                seg_fn = self._segment_fn(seg)
                new_state, pe, W = seg_fn(self.state, self.nbr)
                if self.nbr.needs_rebuild(new_state.x):
                    # atoms moved > skin/2 within one segment; rebuild and
                    # continue (lists stay valid for the *next* segment)
                    self.state = new_state
                    self.rebuild_neighbors()
                else:
                    self.state = new_state
            else:
                self.state = new_state

            done += seg
            if thermo_every and done % thermo_every == 0:
                emit()

        self.thermo_rows = rows
        return rows
