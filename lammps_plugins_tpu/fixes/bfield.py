"""fix bfield — analytic Lorentz-force (q v x B) integrator.

Physics from /root/reference/USER-BFIELD/fix_bfield.cpp (Spreiter & Walter,
J. Comp. Phys. 1999 weak-field Taylor expansion), vectorized:

  initial_integrate (BEFORE the NVE half-kick): snapshot v0 = v(t)
      (fix_bfield.cpp:300-320 — fix bfield must be defined before the
      integrator, cpp:206-219; Engine preserves definition order)
  post_integrate (AFTER half-kick + drift): per-axis velocity rotation and
      position correction using v0 and the CURRENT force f
      (cpp:392-410; omega = qBm2f * q/m * B, cpp:375-377)
  post_force: refresh time-varying B (equal-style variables -> a Python
      callable t -> B, cpp:513-519)

Diagnostics (cpp:412-421): fsum[0] = -sum F_lorentz . x_unwrapped
("pseudo-energy", needs image unmapping), fsum[1:4] = total Lorentz force;
exposed via energy() / vector() like compute_scalar / compute_vector.

The weak-field validity warning (omega*dt > 2*pi*0.001, Spreiter Eq. 1,
cpp:236-278) is checked in setup().
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..core.region import Region
from ..core.state import State
from ..registry import register_fix_style
from .base import Fix, StepContext


@register_fix_style("bfield")
class FixBfield(Fix):
    def __init__(self, bx, by, bz, region: Optional[Region] = None,
                 group_mask=None, fix_id: str = "bfield"):
        """bx/by/bz: constants, or callables t -> value (equal-style vars)."""
        self.b_spec = (bx, by, bz)
        self.region = region
        self.group_mask = group_mask
        self.key = f"bfield:{fix_id}"
        self.time_varying = any(callable(b) for b in self.b_spec)

    def _b_now(self, t: float) -> np.ndarray:
        return np.array([b(t) if callable(b) else b for b in self.b_spec],
                        dtype=np.float64)

    def setup(self, state: State, ctx: StepContext) -> State:
        # requires charges (fix_bfield.cpp:135) — a q=0 system would
        # silently no-op otherwise
        if not np.any(np.asarray(state.q)):
            raise ValueError(
                "fix bfield requires atom attribute q (all charges are "
                "zero; the Lorentz force q v x B would be identically 0)")
        extras = dict(state.extras)
        dtype = state.x.dtype
        extras[self.key] = {
            "v0": jnp.zeros_like(state.v),
            "B": jnp.asarray(self._b_now(0.0), dtype),
            "fsum": jnp.zeros(4, dtype),
        }
        # weak-field check (fix_bfield.cpp:236-278)
        q = np.asarray(state.q)
        m = np.asarray(state.per_atom_mass)
        B = self._b_now(0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            omega = np.abs(np.outer(ctx.units.qBm2f * q / m, B))
        max_omega = 2 * np.pi * 0.001 / ctx.dt
        if np.any(np.nan_to_num(omega) > max_omega):
            warnings.warn("fix bfield does not support strong magnetic "
                          "fields (omega*dt exceeds the weak-field bound)")
        return state.replace(extras=extras)

    # -- hooks --------------------------------------------------------------
    def initial_integrate(self, state: State, ctx: StepContext) -> State:
        extras = dict(state.extras)
        entry = dict(extras[self.key])
        entry["v0"] = state.v
        extras[self.key] = entry
        return state.replace(extras=extras)

    def post_integrate(self, state: State, ctx: StepContext) -> State:
        entry = state.extras[self.key]
        B = entry["B"]
        v0 = entry["v0"]
        dtv = ctx.dt
        m = state.per_atom_mass
        q = state.q
        dtfm = ctx.dtf / m                        # 0.5*dt*ftm2v/m
        c1 = ctx.units.qBm2f * q / m
        omega = c1[:, None] * B[None, :]          # [N,3]

        sel = jnp.ones(state.x.shape[0], dtype=bool)
        gsel = self.group_sel(state)
        if gsel is not None:
            sel = sel & gsel
        if self.region is not None:
            sel = sel & self.region.inside(state.x)
        self_sel = sel.astype(state.x.dtype)[:, None]

        vx, vy, vz = v0[:, 0], v0[:, 1], v0[:, 2]
        f = state.f
        dw = dtv * omega                          # dtv*omega per axis
        hdtfm = 0.5 * dtfm
        hdw = 0.5 * dw

        # velocity rotation, axis by axis (fix_bfield.cpp:392-399)
        dv = jnp.zeros_like(state.v)
        # B0 (omega_x)
        dv = dv.at[:, 1].add(dw[:, 0] * (vz + hdtfm * f[:, 1] - hdw[:, 0] * vy))
        dv = dv.at[:, 2].add(-dw[:, 0] * (vy + hdtfm * f[:, 0] + hdw[:, 0] * vz))
        # B1 (omega_y)
        dv = dv.at[:, 0].add(-dw[:, 1] * (vz + hdtfm * f[:, 0] + hdw[:, 1] * vx))
        dv = dv.at[:, 2].add(dw[:, 1] * (vx + hdtfm * f[:, 1] - hdw[:, 1] * vz))
        # B2 (omega_z)
        dv = dv.at[:, 0].add(dw[:, 2] * (vy + hdtfm * f[:, 1] - hdw[:, 2] * vx))
        dv = dv.at[:, 1].add(-dw[:, 2] * (vx + hdtfm * f[:, 0] + hdw[:, 2] * vy))

        # position correction (fix_bfield.cpp:403-410)
        dx = jnp.zeros_like(state.x)
        dx = dx.at[:, 1].add(dtv * hdw[:, 0] * vz)
        dx = dx.at[:, 2].add(-dtv * hdw[:, 0] * vy)
        dx = dx.at[:, 0].add(-dtv * hdw[:, 1] * vz)
        dx = dx.at[:, 2].add(dtv * hdw[:, 1] * vx)
        dx = dx.at[:, 0].add(dtv * hdw[:, 2] * vy)
        dx = dx.at[:, 1].add(-dtv * hdw[:, 2] * vx)

        v_new = state.v + self_sel * dv
        x_new = state.x + self_sel * dx

        # Lorentz-force diagnostics (cpp:412-421), not used for dynamics
        fx = q * (vy * B[2] - vz * B[1])
        fy = q * (vz * B[0] - vx * B[2])
        fz = q * (vx * B[1] - vy * B[0])
        unwrap = state.box.unmap(x_new, state.image)
        s = sel.astype(state.x.dtype)
        # ctx.asum = MPI_Allreduce analogue under sharding (fix_bfield.cpp:545)
        fsum = ctx.asum(jnp.stack([
            -jnp.sum(s * (fx * unwrap[:, 0] + fy * unwrap[:, 1]
                          + fz * unwrap[:, 2])),
            jnp.sum(s * fx), jnp.sum(s * fy), jnp.sum(s * fz)]))

        extras = dict(state.extras)
        entry = dict(entry)
        entry["fsum"] = fsum
        extras[self.key] = entry
        return state.replace(x=x_new, v=v_new, extras=extras)

    def post_force(self, state: State, ctx: StepContext) -> State:
        if not self.time_varying:
            return state
        # equal-style variable refresh (cpp:513-519); host-evaluated per
        # segment via io_callback-free path: B as a traced function of step
        t = state.step.astype(state.x.dtype) * ctx.dt
        B = jnp.stack([jnp.asarray(b(t)) if callable(b)
                       else jnp.asarray(b, state.x.dtype)
                       for b in self.b_spec])
        extras = dict(state.extras)
        entry = dict(extras[self.key])
        entry["B"] = B.astype(state.x.dtype)
        extras[self.key] = entry
        return state.replace(extras=extras)

    # -- outputs (compute_scalar / compute_vector) ---------------------------
    def energy(self, state: State, ctx: StepContext):
        return state.extras[self.key]["fsum"][0]

    def vector(self, state: State):
        return state.extras[self.key]["fsum"][1:4]
