"""Fix interface — ordered hook composition, TPU-style.

LAMMPS dispatches fixes through bitmask hooks in definition order
(fix_bfield.cpp:120-127 registers INITIAL_INTEGRATE | POST_INTEGRATE |
POST_FORCE; Verlet::run calls them in the order shown in SURVEY.md 3.1).
Here every hook is a pure function State -> State, and the whole step is one
fused, jit-compatible composition — fix-private persistent variables (NH
chain state, bfield's v0 snapshot) live in `state.extras` so the step stays
a pure pytree map usable under lax.scan.
"""

from __future__ import annotations

import dataclasses

from ..core.state import State
from ..core.units import UnitSystem


@dataclasses.dataclass
class StepContext:
    """Static per-run parameters visible to every hook.

    axis/natoms_global: set by the sharded engine — hooks that reduce over
    atoms (thermostat kinetic energy, bfield force tallies) must psum over
    `axis` and use the global atom count for degrees of freedom; both are
    None in single-device runs.
    """

    units: UnitSystem
    dt: float
    axis: "str | None" = None
    natoms_global: "int | None" = None

    @property
    def dtf(self) -> float:
        """0.5 * dt * ftm2v — the half-kick prefactor (fix_bfield.cpp:204)."""
        return 0.5 * self.dt * self.units.ftm2v

    def asum(self, value):
        """Sum a per-shard scalar across the device axis (identity when
        unsharded) — the MPI_Allreduce analogue (fix_bfield.cpp:545).

        The result is re-marked axis-varying (pcast) so it can be stored
        back into per-shard state.extras leaves inside a scanned sharded
        step (shard_map's varying-axes check requires carry in/out types
        to match; the replicated total is simply carried per shard)."""
        if self.axis is None:
            return value
        import jax
        total = jax.lax.psum(value, self.axis)
        return jax.lax.pcast(total, self.axis, to="varying")


class Fix:
    """Base fix: hooks default to identity. `time_integrate` marks NVE-style
    integrators (checked by fix bfield ordering, fix_bfield.cpp:206-219)."""

    name: str = "fix"
    time_integrate: bool = False

    def setup(self, state: State, ctx: StepContext) -> State:
        """Called once before a run (allocate extras, validate)."""
        return state

    def group_sel(self, state: State):
        """Resolve this fix's group to a bool mask over the state's rows,
        or None for 'all' (LAMMPS `fix ID <group> style` semantics).

        Single-device: the stored [N] mask as-is.  Under the sharded
        engine the local rows are a migrating slab whose identity is the
        global atom tag (state.extras['__tag__']); the replicated global
        mask is gathered per row, so group membership follows atoms
        across shard migration — the analogue of atom->mask traveling
        with atoms through Comm::exchange."""
        gm = getattr(self, "group_mask", None)
        if gm is None:
            return None
        import jax.numpy as jnp
        gm = jnp.asarray(gm)
        gm = gm if gm.dtype == jnp.bool_ else gm.astype(bool)
        if gm.shape[0] == state.x.shape[0] \
                and "__tag__" not in state.extras:
            return gm
        tag = state.extras.get("__tag__")
        if tag is None:
            raise ValueError(
                f"group mask length {gm.shape[0]} does not match state "
                f"rows {state.x.shape[0]} and no row tags are present")
        safe = jnp.clip(tag, 0, gm.shape[0] - 1)
        return jnp.where(tag >= 0, gm[safe], False)

    def initial_integrate(self, state: State, ctx: StepContext) -> State:
        return state

    def post_integrate(self, state: State, ctx: StepContext) -> State:
        return state

    def post_force(self, state: State, ctx: StepContext) -> State:
        return state

    def final_integrate(self, state: State, ctx: StepContext) -> State:
        return state

    def end_of_step(self, state: State, ctx: StepContext) -> State:
        return state

    def energy(self, state: State, ctx: StepContext):
        """compute_scalar() analogue; contribution to thermo if requested."""
        return 0.0
