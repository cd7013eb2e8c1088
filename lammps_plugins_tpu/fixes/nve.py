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

    def __init__(self, group=None):
        self.group = group   # group masks: future work (reference uses 'all')

    def initial_integrate(self, state: State, ctx: StepContext) -> State:
        m = state.per_atom_mass[:, None]
        v = state.v + ctx.dtf * state.f / m
        x = state.x + ctx.dt * v
        return state.replace(x=x, v=v)

    def final_integrate(self, state: State, ctx: StepContext) -> State:
        m = state.per_atom_mass[:, None]
        v = state.v + ctx.dtf * state.f / m
        return state.replace(v=v)
