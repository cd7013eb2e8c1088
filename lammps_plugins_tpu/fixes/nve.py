"""fix nve — velocity-Verlet (LAMMPS FixNVE semantics).

initial_integrate: v += dtf * f / m ; x += dt * v
final_integrate:   v += dtf * f / m
with dtf = 0.5 * dt * ftm2v (metal units ftm2v, core/units.py).
"""

from __future__ import annotations

from ..core.state import State
from ..registry import register_fix_style
from .base import Fix, StepContext


@register_fix_style("nve")
class FixNVE(Fix):
    time_integrate = True

    def __init__(self, group_mask=None):
        """group_mask: optional [N] bool — integrate only these atoms
        (LAMMPS `fix ID <group> nve`); None = all."""
        self.group_mask = group_mask

    def _sel(self, state):
        sel = self.group_sel(state)
        if sel is None:
            return 1.0
        return sel.astype(state.x.dtype)[:, None]

    def initial_integrate(self, state: State, ctx: StepContext) -> State:
        m = state.per_atom_mass[:, None]
        s = self._sel(state)
        v = state.v + s * (ctx.dtf * state.f / m)
        x = state.x + s * (ctx.dt * v)
        return state.replace(x=x, v=v)

    def final_integrate(self, state: State, ctx: StepContext) -> State:
        m = state.per_atom_mass[:, None]
        v = state.v + self._sel(state) * (ctx.dtf * state.f / m)
        return state.replace(v=v)
