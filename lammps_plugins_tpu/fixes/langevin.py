"""fix langevin — Langevin thermostat (LAMMPS FixLangevin semantics).

`fix ID group langevin Tstart Tstop damp seed` adds a friction and a
random force in post_force (it does NOT time-integrate; pair with
`fix nve`, exactly as LAMMPS requires):

    f += gamma1 * v + gamma2 * uniform(-0.5, 0.5)

with the LAMMPS prefactors (fix_langevin.cpp post_force / compute targets):

    gamma1 = -m / (damp * ftm2v)
    gamma2 = sqrt(24 * kB * T(t) * m * mvv2e / (damp * dt))

(the sqrt(24) matches LAMMPS's uniform noise of variance 1/12: the
fluctuation-dissipation balance 2 m kB T / (damp dt) per component).
T(t) ramps linearly from t_start to t_stop over the run, like FixNVT.

TPU-native noise: a counter-based jax.random stream keyed on
(seed, state.step) — pure, scan-compatible, and reproducible for a given
step regardless of segment boundaries.  Under the sharded engine the
shard index is folded in as well so shards draw independent noise.
Statistically equivalent to LAMMPS (RanMars per-atom uniforms);
bit-identical streams are not reproduced (no reference log depends on
them, SURVEY.md section 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import State
from ..registry import register_fix_style
from .base import Fix, StepContext


@register_fix_style("langevin")
class FixLangevin(Fix):
    time_integrate = False

    def __init__(self, t_start: float, t_stop: float, damp: float,
                 seed: int, group_mask=None):
        if damp <= 0.0:
            raise ValueError("fix langevin: damp must be > 0")
        if seed <= 0:
            raise ValueError("fix langevin: seed must be > 0")
        self.t_start = float(t_start)
        self.t_stop = float(t_stop)
        self.damp = float(damp)
        self.seed = int(seed)
        # ramp window; set by Script.cmd_run (mirrors FixNVT)
        self.begin_step = 0
        self.end_step = 0
        self.group_mask = (None if group_mask is None
                           else np.asarray(group_mask, bool))

    def _sel(self, state: State):
        sel = self.group_sel(state)
        if sel is None:
            return jnp.ones((state.x.shape[0], 1), state.x.dtype)
        return sel.astype(state.x.dtype)[:, None]

    def _t_target(self, state: State):
        if self.end_step <= self.begin_step:
            return jnp.asarray(self.t_start, state.x.dtype)
        delta = (state.step - self.begin_step) / max(
            1, self.end_step - self.begin_step)
        delta = jnp.clip(delta.astype(state.x.dtype), 0.0, 1.0)
        return self.t_start + delta * (self.t_stop - self.t_start)

    def post_force(self, state: State, ctx: StepContext) -> State:
        u = ctx.units
        dtype = state.x.dtype
        m = state.per_atom_mass[:, None]
        t_target = self._t_target(state)

        key = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                 state.step)
        if ctx.axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(ctx.axis))
        noise = jax.random.uniform(key, state.v.shape, dtype,
                                   minval=-0.5, maxval=0.5)

        gamma1 = -m / (self.damp * u.ftm2v)
        gamma2 = jnp.sqrt(24.0 * u.boltz * t_target * m * u.mvv2e
                          / (self.damp * ctx.dt))
        f = state.f + self._sel(state) * (gamma1 * state.v + gamma2 * noise)
        return state.replace(f=f)
