"""Energy minimization — FIRE (fast inertial relaxation engine), TPU-style.

The LAMMPS workflow equivalent of `min_style fire` + `minimize etol ftol
maxiter maxeval` (Min/MinFire; the reference decks don't minimize, but any
user preparing a structure for the plugin potentials does).  Chosen over CG
because FIRE is the MD-shaped minimizer: its iteration IS a damped MD step,
so it reuses the engine's pair forces, neighbor machinery, and fixed-shape
jit segments unchanged — no line searches with data-dependent trip counts,
which would be host round-trips on a tunneled TPU.

Parameters follow LAMMPS min_fire.cpp defaults: delaystep 5, dt_grow 1.1,
dt_shrink 0.5, alpha0 0.25, alpha_shrink 0.99, tmax 10 (dtmax = 10*dt),
halfstepback yes, integrator eulerimplicit.

Stopping matches LAMMPS Min::run semantics:
  * etol: |E_prev - E| <= etol * |E_prev + E + EPS_ENERGY| / 2
  * ftol: ||F||_2 < ftol  (2-norm of the global force vector)
  * maxiter iterations cap.

The FIRE loop runs as jitted lax.scan chunks with a frozen-when-converged
carry; between chunks the host checks convergence and the half-skin
displacement bound (same rebuild criterion as dynamics — list slack makes
rebuild timing physics-neutral).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

EPS_ENERGY = 1e-8

DELAYSTEP = 5
DT_GROW = 1.1
DT_SHRINK = 0.5
ALPHA0 = 0.25
ALPHA_SHRINK = 0.99
TMAX = 10.0


@dataclasses.dataclass
class MinResult:
    stop_criterion: str
    iterations: int
    e_initial: float
    e_final: float
    fnorm2_final: float
    fnorm_inf_final: float

    def __repr__(self):
        return (f"Minimization stats: {self.stop_criterion}\n"
                f"  Iterations = {self.iterations}\n"
                f"  Energy initial/final = {self.e_initial:.10g} "
                f"{self.e_final:.10g}\n"
                f"  Force 2-norm final = {self.fnorm2_final:.6g}, "
                f"max component = {self.fnorm_inf_final:.6g}")


def minimize(engine, etol: float = 0.0, ftol: float = 1e-6,
             maxiter: int = 1000, chunk: int = 0) -> MinResult:
    """Relax engine.state positions with FIRE; returns MinResult.

    Leaves engine.state at the relaxed positions with v = 0 and f = the
    final forces (so a following `run` starts from a valid setup, like
    LAMMPS after `minimize`).
    """
    pair, units = engine.pair, engine.units
    dt_md = engine.ctx.dt
    ftm2v = units.ftm2v
    dtmax = TMAX * dt_md
    if chunk <= 0:
        chunk = max(4, engine.check_every)
    half_skin_sq = (0.5 * engine.skin) ** 2

    engine._ensure_neighbors()
    state = engine.state
    dtype = state.x.dtype
    m = state.per_atom_mass[:, None]

    def fire_chunk(x, nbr, carry):
        """`chunk` FIRE iterations; converged carries freeze in place."""

        def energy_force(xc):
            pe, f, _ = pair.energy_force_virial(xc, state.type, nbr,
                                                state.box.h)
            return pe, f

        def body(c, _):
            x, v, dt, alpha, npos, e_prev, done, crit = c
            pe, f = energy_force(x)

            # convergence checks against the PREVIOUS iterate's energy.
            # Denominator per LAMMPS Min::run: etol * (|e_prev| + |e| +
            # EPS)/2 — the sum-of-magnitudes form cannot vanish for
            # opposite-sign energies; etol is checked BEFORE ftol (Min::run
            # order), so a step hitting both reports 'energy tolerance'.
            fnorm2 = jnp.sqrt(jnp.sum(f * f))
            e_ok = jnp.abs(e_prev - pe) <= (
                etol * (jnp.abs(e_prev) + jnp.abs(pe) + EPS_ENERGY) * 0.5)
            e_hit = jnp.logical_and(etol > 0.0, e_ok)
            f_hit = jnp.logical_and(ftol > 0.0, fnorm2 < ftol)
            new_crit = jnp.where(e_hit, 1, jnp.where(f_hit, 2, 0))
            crit = jnp.where(done == 0, new_crit, crit)
            done = jnp.maximum(done, new_crit)

            vdotf = jnp.sum(v * f)
            uphill = vdotf <= 0.0
            # halfstepback on reversal, then reset the dynamics
            x = jnp.where(uphill, x - (0.5 * dt) * v, x)
            v = jnp.where(uphill, 0.0, v)
            npos = jnp.where(uphill, 0, npos + 1)
            grow = npos > DELAYSTEP
            dt = jnp.where(uphill, dt * DT_SHRINK,
                           jnp.where(grow, jnp.minimum(dt * DT_GROW, dtmax),
                                     dt))
            alpha = jnp.where(uphill, ALPHA0,
                              jnp.where(grow, alpha * ALPHA_SHRINK, alpha))

            # euler-implicit kick, then velocity mixing toward the force
            v = v + (dt * ftm2v) * f / m
            vmag = jnp.sqrt(jnp.sum(v * v))
            fmag = jnp.sqrt(jnp.sum(f * f))
            fhat = f / jnp.maximum(fmag, 1e-300)
            v = (1.0 - alpha) * v + (alpha * vmag) * fhat
            xn = x + dt * v

            frozen = done > 0
            x = jnp.where(frozen, x, xn)
            v = jnp.where(frozen, 0.0 * v, v)
            return (x, v, dt, alpha, npos, pe, done, crit), None

        (x, v, dt, alpha, npos, e_prev, done, crit), _ = jax.lax.scan(
            body, (x,) + carry, None, length=chunk)
        d = x - nbr.x_build
        maxdisp_sq = jnp.max(jnp.sum(d * d, axis=-1))
        return x, (v, dt, alpha, npos, e_prev, done, crit), maxdisp_sq

    chunk_jit = jax.jit(fire_chunk)

    pe0, _ = engine.evaluate()
    e_initial = float(pe0)
    x = state.x
    # e_prev sentinel: offset so the FIRST energy check can't trivially
    # pass (the first iterate recomputes E at the same x; LAMMPS compares
    # successive iterates only)
    e_prev0 = e_initial + max(1.0, 2.0 * abs(e_initial))
    carry = (jnp.zeros_like(state.v), jnp.asarray(dt_md, dtype),
             jnp.asarray(ALPHA0, dtype), jnp.asarray(0, jnp.int32),
             jnp.asarray(e_prev0, dtype), jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32))

    it = 0
    crit_code = 0
    fresh_list = True            # list was just built at the current x
    while it < maxiter:
        n = min(chunk, maxiter - it)
        if n != chunk:
            chunk = n
            chunk_jit = jax.jit(fire_chunk)
        x_new, carry_new, maxdisp_sq = chunk_jit(x, engine.nbr, carry)
        if float(maxdisp_sq) > half_skin_sq and not fresh_list:
            # the chunk outran the half-skin list slack: its forces (and
            # any converged/done decision inside it) used a stale list —
            # discard and redo from a fresh build, exactly like the
            # dynamics path (Engine.run mid-segment redo).  A fresh-list
            # chunk that still trips is accepted and the next iteration
            # rebuilds first (same guarantee level as Engine.run).
            engine.state = engine.state.replace(x=x)
            engine.rebuild_neighbors()
            # rebuild wraps positions into the box; pick up the wrapped x
            # so the redone chunk is consistent with the fresh list
            x = engine.state.x
            fresh_list = True
            continue
        x, carry = x_new, carry_new
        it += n
        done = int(carry[5])
        if done:
            crit_code = int(carry[6])
            break
        fresh_list = False
        if float(maxdisp_sq) > half_skin_sq:
            engine.state = engine.state.replace(x=x)
            engine.rebuild_neighbors()
            x = engine.state.x
            fresh_list = True

    engine.state = engine.state.replace(x=x, v=jnp.zeros_like(state.v))
    engine._f_valid = False
    pe1, _ = engine.evaluate()
    f_np = np.asarray(engine.state.f)
    crit = {0: "max iterations", 1: "energy tolerance",
            2: "force tolerance"}[crit_code]
    return MinResult(stop_criterion=crit, iterations=it,
                     e_initial=e_initial, e_final=float(pe1),
                     fnorm2_final=float(np.sqrt((f_np ** 2).sum())),
                     fnorm_inf_final=float(np.abs(f_np).max()))
