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
from .timers import Timers


def _quantize_k(target: int) -> int:
    """Neighbor-list K capacity for a measured kmax `target`.

    Small K (REBO-class lists, K <= 48): multiples of 4 — the K^2 angular
    kernels are quadratic in K, so half a sublane tile of slack is already
    ~7% of the step; Mosaic masks the ragged final sublane tile.

    Large K (EAM-class master lists): multiples of 16.  Per-edge work is
    linear in K there (<=4% slack per quantum), while every distinct K is
    a full fused-loop retrace — measured 200-300 s for the 32k-atom AEAM
    loop on the tunneled backend.  At 863 K kmax creeps upward for
    hundreds of steps; quantum 4 caused 4x the retraces of quantum 16
    (the bench's 935 s warmup was K-creep compiles, not physics).
    Minimum 16 bounds retrace churn on tiny systems."""
    if target <= 48:
        return max(16, -(-target // 4) * 4)
    return -(-target // 16) * 16


class Engine:
    """Owns the jitted step and the host-side rebuild loop."""

    def __init__(self, state: State, pair: PairStyle, fixes: Sequence[Fix],
                 units: UnitSystem, dt: float | None = None,
                 skin: float | None = None, check_every: int = 10,
                 device_rebuild: bool | None = None):
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
        self._loop_jit = None
        self._efv_jit = None
        self._ev_jit = None
        self._force_jit = None
        self._f_valid = False
        self._thermo_jit = None
        self._disp_jit = None
        # once any K overflow recovery has run, tighten with extra
        # headroom: heating systems creep kmax upward, and a kmax+2
        # cap re-overflows within a span or two — each cycle costing a
        # discarded span plus two retraces (observed on the 863 K AEAM
        # bench: two full bench reps eaten by resize churn)
        self._k_headroom = 2
        # per-tier high-water mark of measured kmax: re-size targets use
        # it so the cap never re-tightens below a count the run has
        # already seen.  Without it, hot systems whose kmax fluctuates
        # around a quantization boundary oscillate grow<->tighten, and
        # every flip is a full retrace (observed on the 863 K AEAM bench:
        # K 128<->192 flips ate 100+ s per 48-step span; with the
        # ratchet the same bench holds 1.03e6 atom-steps/s steady)
        self._k_hwm = {}
        # on-device rebuild: the TPU-native path for large systems (host
        # rebuild is O(seconds) at 100k atoms; device is O(ms))
        if device_rebuild is None:
            device_rebuild = state.natoms >= 20000
        self.device_rebuild = device_rebuild
        self._plan = None
        self._cut_mats_dev = None
        self._maxdisp_is_device = False
        self.timers = Timers()

        pair.prepare(np.asarray(state.type))
        pair.bind_charges(state.q)
        for fix in self.fixes:
            self.state = fix.setup(self.state, self.ctx)

    # -- neighbor maintenance (host side, numpy) ---------------------------
    def _needs_rebuild(self, x_np: np.ndarray) -> bool:
        if self._x_build_np is None:
            return True
        d = x_np - self._x_build_np
        return bool((d * d).sum(axis=1).max() > (0.5 * self.skin) ** 2)

    def rebuild_neighbors(self, x_np: np.ndarray | None = None):
        if self.device_rebuild:
            self._rebuild_on_device()
            return
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

    # -- device rebuild path ------------------------------------------------
    def _make_plan(self, slack: float = 1.3):
        """Size capacities from an exact host build at current positions."""
        from ..neighbor import device_build

        x_np, _ = self.state.box.wrap_np(np.asarray(self.state.x))
        t_np = np.asarray(self.state.type)
        requests = self.pair.neighbor_requests()
        host = build_neighbor_data(x_np, t_np, self.state.box, requests,
                                   skin=self.skin, dtype=self.state.x.dtype)
        k_counts = {name: int(lst.mask.sum(axis=1).max())
                    for name, lst in host.lists.items()}
        ghost_count = host.ghosts.count
        # cell occupancy under the plan's grid geometry
        plan0 = device_build.make_plan(
            self.state.box, requests, self.skin, ghost_count, 4, k_counts,
            slack=slack, cell_tiers=getattr(self.pair, "cell_tiers", ()))
        owner = np.asarray(host.ghosts.owner)
        shift = np.asarray(host.ghosts.shift)
        h = self.state.box.h_np()
        x_all = np.concatenate([x_np, x_np[owner] + shift @ h])
        def occupancy(pts, dims, size, mn):
            dims = np.array(dims)
            c3 = np.clip(((pts - mn) / size).astype(np.int64), 0, dims - 1)
            cid = (c3[:, 0] * dims[1] + c3[:, 1]) * dims[2] + c3[:, 2]
            return int(np.bincount(cid).max())

        if plan0.cell_frac:
            # fractional binning: measure in wrapped lattice coordinates
            # (matches device_rebuild's fractional cell path)
            hinv = np.linalg.inv(h)
            lo = self.state.box.lo_np()
            f_own = (x_np - lo) @ hinv
            f_own -= np.floor(f_own)
            f_all = np.concatenate([f_own, f_own[owner] + shift])
            s_vec = 1.0 / (np.array(plan0.cell_dims, np.float64) - 2.0)
            occ = occupancy(f_all, plan0.cell_dims, s_vec, -s_vec)
        else:
            occ = occupancy(x_all, plan0.cell_dims, plan0.cell_size,
                            np.array(plan0.cell_mn))
        occ_f = occupancy(x_all, plan0.cand_dims, plan0.cand_size,
                          np.array(plan0.grid_mn))
        # boundary-atom count for the two-stage ghost compaction
        hinv = np.linalg.inv(h)
        fr = (x_np - self.state.box.lo_np()) @ hinv
        fr -= np.floor(fr)
        mg = np.array(plan0.margins)
        bnd = int((((fr <= mg) | (fr >= 1.0 - mg)) & (mg > 0)).any(1).sum())
        self._plan = device_build.make_plan(
            self.state.box, requests, self.skin, ghost_count, occ, k_counts,
            slack=slack, cell_tiers=getattr(self.pair, "cell_tiers", ()),
            mirror_tiers=getattr(self.pair, "mirror_tiers", ()),
            cand_occupancy=occ_f, bnd_count=int(bnd * 1.2) + 64)
        dtype = self.state.x.dtype
        self._cut_mats_dev = {k: jnp.asarray(v, dtype)
                              for k, v in requests.items()}
        self._box_dev = (jnp.asarray(h, dtype),
                         jnp.asarray(np.linalg.inv(h), dtype),
                         jnp.asarray(self.state.box.lo_np(), dtype))

    def _make_plan_fast(self, slack: float = 1.25):
        """Density-based capacity estimation (no host neighbor build)."""
        from ..neighbor import device_build

        requests = self.pair.neighbor_requests()
        self._plan = device_build.make_plan_from_density(
            self.state.box, requests, self.skin, self.state.natoms,
            slack=slack, cell_tiers=getattr(self.pair, "cell_tiers", ()),
            mirror_tiers=getattr(self.pair, "mirror_tiers", ()))
        dtype = self.state.x.dtype
        h = self.state.box.h_np()
        self._cut_mats_dev = {k: jnp.asarray(v, dtype)
                              for k, v in requests.items()}
        self._box_dev = (jnp.asarray(h, dtype),
                         jnp.asarray(np.linalg.inv(h), dtype),
                         jnp.asarray(self.state.box.lo_np(), dtype))

    def _rebuild_on_device(self, _retry: int = 0):
        from ..neighbor import device_build

        if self._plan is None:
            self._make_plan_fast()
        h, h_inv, lo = self._box_dev
        xw, image, nbr, flags = device_build.device_rebuild(
            self._plan, self.state.x, self.state.image, self.state.type,
            h, h_inv, lo, self._cut_mats_dev)
        flags_np = jax.device_get(flags)
        if any(bool(v) for k, v in flags_np.items() if "overflow" in k):
            if _retry >= 6:
                raise RuntimeError(f"device rebuild overflow persists: "
                                   f"{flags_np}")
            # re-size from the measured counts and retry; counts measured
            # under a too-small capacity can themselves be truncated (e.g.
            # cell occupancy before all ghosts fit), so convergence can
            # take a few rounds — each round's measurement is exact for the
            # capacities that DID fit
            self._k_headroom = 10
            self._resize_plan(flags_np, grow=1.5 * (1.3 ** _retry))
            return self._rebuild_on_device(_retry + 1)
        if not getattr(self, "_plan_tightened", False):
            # the density estimate over-pads (K^2 angular tensors make this
            # expensive); re-size once to measured counts + slack
            self._plan_tightened = True
            want_k = {k.split(":", 2)[2]: int(v) for k, v in flags_np.items()
                      if k.startswith("count:k:")}
            loose = any(dict(self._plan.k_caps)[name] > 1.6 * max(v, 8)
                        for name, v in want_k.items())
            # also retrace once if a windowed mirror combine is available
            # but the initial plan carries no window cap
            w_needed = max([int(v) for k, v in flags_np.items()
                            if k.startswith("count:mirwin:")] or [0])
            want_w = device_build.choose_mirror_window(
                self.state.natoms, w_needed)[0]
            loose = loose or (want_w and not self._plan.mirror_window)
            # block-sparse reaction combine: enable once the rebuild has
            # measured the route geometry (ops/react_pallas.py)
            want_r = self._choose_react_from(flags_np)[0]
            loose = loose or (want_r and not self._plan.react_nw)
            if loose:
                # 1.3 not 1.15: hot systems (e.g. 863 K sample.in) grow
                # kmax after equilibration and every overflow re-size is a
                # full retrace
                self._resize_plan(flags_np, grow=1.3)
                return self._rebuild_on_device(_retry)
        elif not getattr(self, "_recovering", False):
            # overflow recovery grows K by 1.5x from possibly-truncated
            # counts, which can leave the STEP paying 50%+ slack forever
            # (observed: cap 176 vs steady kmax 114 at 863 K = 1.54x on
            # every per-edge gather).  Re-tighten to the exact k_final
            # target once the measured kmax sits >= 32 below the cap; the
            # hysteresis keeps heating systems from flip-flopping (each
            # re-size is a retrace).  SUPPRESSED while a span-overflow
            # recovery is in flight (_recovering): the recovery grows the
            # cap precisely because kmax outgrew it mid-span, and an
            # instantaneous-kmax tighten here would undo that growth —
            # observed as a never-converging resize/overflow tug-of-war
            # on the 863 K AEAM bench (RuntimeError after 6 retries,
            # host-loop fallback).
            self._note_k_counts(flags_np)
            caps = dict(self._plan.k_caps)
            slack_k = False
            for k, v in flags_np.items():
                if k.startswith("count:k:"):
                    name = k.split(":", 2)[2]
                    hwm = max(int(v), self._k_hwm.get(name, 0))
                    target = _quantize_k(hwm + self._k_headroom)
                    if caps[name] - target >= 32:
                        slack_k = True
            if slack_k:
                self._resize_plan(flags_np, grow=1.0)
                return self._rebuild_on_device(_retry)
        self.state = self.state.replace(x=xw, image=image)
        self.nbr = nbr
        self._x_build_np = None
        self._maxdisp_is_device = True
        self._pending_rebuild = False

    def _note_k_counts(self, flags_np):
        """Ratchet the per-tier kmax high-water marks."""
        for k, v in flags_np.items():
            if k.startswith("count:k:"):
                name = k.split(":", 2)[2]
                self._k_hwm[name] = max(self._k_hwm.get(name, 0), int(v))

    def _choose_react_from(self, flags_np):
        """(react_nw, react_kc, react_qr) from measured route geometry.

        High-water-marked like kmax: the caps never shrink within a run,
        so fluctuating counts cannot flip-flop retraces."""
        from ..neighbor import device_build
        hwm = getattr(self, "_react_hwm", [0, 0, 0])
        for i, pref in enumerate(("count:rnw:", "count:rkc:", "count:rq:")):
            vals = [int(v) for k, v in flags_np.items()
                    if k.startswith(pref)]
            if vals:
                hwm[i] = max(hwm[i], max(vals))
        self._react_hwm = hwm
        return device_build.choose_react(self.state.natoms, *hwm)

    def _resize_plan(self, flags_np, grow: float):
        """New plan from measured counts (overflow recovery / tightening)."""
        from ..neighbor import device_build

        self._note_k_counts(flags_np)
        requests = self.pair.neighbor_requests()
        # Final K = measured kmax (+ small headroom), quantized to 16:
        # deterministic in the measurement, so repeated runs of the same
        # scene land on the same K (and the same compiled step).  Heating
        # systems re-size while kmax creeps; every distinct K is a full
        # retrace (~30-80 s on the tunneled backend), so quantization
        # bounds the number of retraces.  grow only scales the headroom
        # on overflow recovery (where the measured count may itself be
        # truncated by the too-small capacity).
        k_counts = {}
        for k, v in flags_np.items():
            if not k.startswith("count:k:"):
                continue
            name = k.split(":", 2)[2]
            m = max(int(v), self._k_hwm.get(name, 0))
            hr = self._k_headroom
            target = m + hr if grow <= 1.3 else int(m * grow) + hr
            k_counts[name] = _quantize_k(target)
        cand_occ = (int(flags_np["count:candcell"])
                    if "count:candcell" in flags_np else None)
        # windowed mirror combine: size the cyclic window cap from the
        # measured needed width (grow on mirwin overflow recovery)
        w_needed = max([int(v) for k, v in flags_np.items()
                        if k.startswith("count:mirwin:")] or [0])
        if grow > 1.0 and any(k.startswith("mirwin_overflow")
                              and bool(v) for k, v in flags_np.items()):
            w_needed = int(w_needed * grow)
        mir_w, mir_b = device_build.choose_mirror_window(
            self.state.natoms, w_needed)
        r_nw, r_kc, r_qr = self._choose_react_from(flags_np)
        bnd_m = int(flags_np.get("count:bnd", 0))
        self._bnd_hwm = max(getattr(self, "_bnd_hwm", 0), bnd_m)
        bnd_c = (int(self._bnd_hwm * (1.2 if grow <= 1.3 else grow)) + 64
                 if self._bnd_hwm else 0)
        self._plan = device_build.make_plan(
            self.state.box, requests, self.skin,
            int(flags_np["count:ghost"]), int(flags_np["count:cell"]),
            k_counts, slack=grow, k_final=True,
            cell_tiers=getattr(self.pair, "cell_tiers", ()),
            mirror_tiers=getattr(self.pair, "mirror_tiers", ()),
            cand_occupancy=cand_occ,
            mirror_window=mir_w, mirror_chunk=mir_b,
            react_nw=r_nw, react_kc=r_kc, react_qr=r_qr,
            bnd_count=bnd_c)
        self._seg_jit = None       # shapes change -> retrace
        self._loop_jit = None

    # -- jitted computations ----------------------------------------------
    def _one_step(self, state: State, nbr: NeighborData):
        ctx = self.ctx
        for f in self.fixes:
            state = f.initial_integrate(state, ctx)
        for f in self.fixes:
            state = f.post_integrate(state, ctx)
        # hot path is forces-only; energy/virial are evaluated separately
        # at thermo boundaries (LAMMPS computes them every step but only
        # output consumes them)
        force = self.pair.forces(state.x, state.type, nbr, state.box.h)
        state = state.replace(f=force)
        for f in self.fixes:
            state = f.post_force(state, ctx)
        for f in self.fixes:
            state = f.final_integrate(state, ctx)
        for f in self.fixes:
            state = f.end_of_step(state, ctx)
        state = state.replace(step=state.step + 1)
        return state

    def _segment(self, state, nbr, nsteps: int):
        """Run `nsteps` fused steps on device. Compiled once per nsteps."""
        if self._seg_jit is None:
            def seg(state, nbr, nsteps):
                def body(st, _):
                    return self._one_step(st, nbr), None

                st, _ = jax.lax.scan(body, state, None, length=nsteps)
                # max displacement^2 vs list-build positions, for the
                # host-side rebuild decision without an extra eager op
                d = st.x - nbr.x_build
                maxdisp_sq = jnp.max(jnp.sum(d * d, axis=-1))
                return st, maxdisp_sq

            self._seg_jit = jax.jit(seg, static_argnums=2)
        return self._seg_jit(state, nbr, nsteps)

    # -- device-resident run loop -------------------------------------------
    def _device_loop_fn(self):
        """Build the fused multi-segment loop: segments AND neighbor
        rebuilds run under one lax.while_loop, so a span of `nsteps` costs
        exactly ONE host round-trip (the tunneled backend's RTT is ~35 ms —
        at check_every=12 that was ~3 ms/step of pure pipeline bubble).

        Semantics are bit-identical to the host loop: a segment whose
        max displacement trips the half-skin bound is DISCARDED and re-run
        from its start state with fresh lists (a no-advance iteration);
        a fresh-list segment that still trips is accepted and the next
        iteration rebuilds first (the reference's own guarantee level:
        neigh_modify delay/every can miss the same fast-atom case).  The
        predictive proactive rebuild matches the host loop.

        Overflow handling moves to the caller: rebuild flags are max-merged
        across the loop and checked ONCE per span; any overflow discards
        the whole span and re-runs it from the saved start after a plan
        re-size (rare — only when kmax outgrows its cap).
        """
        from ..neighbor import device_build

        plan = self._plan
        h, h_inv, lo = self._box_dev
        cut_mats = self._cut_mats_dev
        half2 = jnp.asarray((0.5 * self.skin) ** 2, self.state.x.dtype)
        check = self.check_every

        def rebuild(state):
            xw, image, nbr, flags = device_build.device_rebuild(
                plan, state.x, state.image, state.type, h, h_inv, lo,
                cut_mats)
            return state.replace(x=xw, image=image), nbr, flags

        def loop(state, nbr, pending0, nsteps):
            zero_flags = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(rebuild, state)[2])
            halfd = jnp.sqrt(half2)

            def body(carry):
                state, nbr, done, pending, flags, dprev, n_rb = carry

                def do_rb(s, n, f):
                    s2, n2, f2 = rebuild(s)
                    f = jax.tree_util.tree_map(
                        lambda a, b: jnp.maximum(a, b), f, f2)
                    return s2, n2, f

                state, nbr, flags = jax.lax.cond(
                    pending, do_rb, lambda s, n, f: (s, n, f),
                    state, nbr, flags)
                # in-loop rebuild counter: lets the host attribute span
                # time to the Neigh section truthfully (log.rebomos:62-70)
                n_rb = n_rb + pending.astype(jnp.int32)

                def one(st, _):
                    return self._one_step(st, nbr), None

                ns, _ = jax.lax.scan(one, state, None, length=check)
                dd = ns.x - nbr.x_build
                md = jnp.max(jnp.sum(dd * dd, axis=-1))
                tripped = md > half2
                accept = jnp.logical_or(pending, jnp.logical_not(tripped))
                state = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(accept, a, b), ns, state)
                done = done + jnp.where(accept, check, 0)
                # Predictive proactive rebuild: extrapolate one segment of
                # displacement growth and rebuild BEFORE the half-skin
                # trips.  The fixed 80%-of-half-skin rule discarded nearly
                # every segment on hot systems (863 K AEAM: per-segment
                # growth ~0.11 A vs the 0.10 A gap it left, so segments
                # jumped from "under 80%" straight past the trip — each
                # discard re-runs the whole segment, ~12x step cost).  A
                # discarded segment still has md > half2, so pending stays
                # true and the re-run gets fresh lists, as before.  dprev
                # is the previous segment's end displacement in the SAME
                # build epoch (reset semantics: after a rebuild d < dprev,
                # growth clamps to 0 and only d itself drives the rule).
                d = jnp.sqrt(md)
                growth = jnp.maximum(d - dprev, 0.0)
                pending = (d + growth > 0.95 * halfd) | tripped
                return state, nbr, done, pending, flags, d, n_rb

            carry = (state, nbr, jnp.zeros((), jnp.int32),
                     pending0, zero_flags,
                     jnp.zeros((), self.state.x.dtype),
                     jnp.zeros((), jnp.int32))
            state, nbr, done, pending, flags, _, n_rb = jax.lax.while_loop(
                lambda c: c[2] < nsteps, body, carry)
            return state, nbr, pending, flags, n_rb

        return jax.jit(loop, static_argnums=3)

    def _run_span_device(self, nsteps: int, _retry: int = 0):
        """Advance `nsteps` (a multiple of check_every) with one device
        call; one flags fetch at the end decides overflow re-runs."""
        if self._loop_jit is None:
            self._loop_jit = self._device_loop_fn()
        start_state, start_nbr = self.state, self.nbr
        start_pending = getattr(self, "_pending_rebuild", False)
        state, nbr, pending, flags, n_rb = self._loop_jit(
            self.state, self.nbr, jnp.asarray(start_pending), nsteps)
        flags_np = jax.device_get(flags)
        if any(bool(v) for k, v in flags_np.items() if "overflow" in k):
            if _retry >= 6:
                raise RuntimeError(
                    f"device rebuild overflow persists: {flags_np}")
            # a truncated list stepped physics — discard the whole span,
            # re-size from the measured counts, and re-run it
            self.state, self.nbr = start_state, start_nbr
            self._k_headroom = 10
            self._resize_plan(flags_np, grow=1.5 * (1.3 ** _retry))
            self._loop_jit = None
            self._recovering = True     # block re-tightening mid-recovery
            try:
                self.rebuild_neighbors()
                return self._run_span_device(nsteps, _retry + 1)
            finally:
                self._recovering = False
        self.state, self.nbr = state, nbr
        self._f_valid = True
        self._x_build_np = None
        self._maxdisp_is_device = True
        self._pending_rebuild = pending    # device scalar; fetched lazily
        # attribute in-loop rebuild time to Neigh (the caller books the
        # whole fused span under Pair): count the rebuilds the loop ran
        # and scale by the measured warm standalone rebuild cost
        n_rb_i = int(jax.device_get(n_rb))
        if n_rb_i > 0:
            self.timers.transfer("Pair", "Neigh",
                                 n_rb_i * self._rebuild_cost_estimate())
        if bool(flags_np.get("count:ghost", 0)) \
                and not getattr(self, "_recovering", False):
            # at least one in-loop rebuild ran: apply the same K cap
            # re-tightening policy as the host rebuild path (skipped while
            # a span-overflow recovery is in flight, same as above)
            self._note_k_counts(flags_np)
            caps = dict(self._plan.k_caps)
            for k, v in flags_np.items():
                if k.startswith("count:k:") and int(v) > 0:
                    name = k.split(":", 2)[2]
                    hwm = max(int(v), self._k_hwm.get(name, 0))
                    target = _quantize_k(hwm + self._k_headroom)
                    if caps[name] - target >= 32:
                        self._resize_plan(flags_np, grow=1.0)
                        self._loop_jit = None
                        self.rebuild_neighbors()
                        break

    def _rebuild_cost_estimate(self) -> float:
        """Warm per-rebuild device time (seconds), measured once.

        Runs one standalone device_rebuild (already compiled by the
        startup rebuild) with a blocking fetch; cached for the engine's
        lifetime.  Used to split fused-span time between Pair and Neigh
        — the reference prints this breakdown per section
        (log.rebomos-bulk.1:62-70)."""
        cost = getattr(self, "_rebuild_cost", None)
        if cost is not None:
            return cost
        from ..neighbor import device_build
        import time as _time
        h, h_inv, lo = self._box_dev
        t0 = _time.perf_counter()
        out = device_build.device_rebuild(
            self._plan, self.state.x, self.state.image, self.state.type,
            h, h_inv, lo, self._cut_mats_dev)
        jax.block_until_ready(out)
        self._rebuild_cost = _time.perf_counter() - t0
        return self._rebuild_cost

    def _ensure_neighbors(self):
        if self.nbr is None:
            self.rebuild_neighbors()
        elif self.device_rebuild:
            # the jit wrapper must be cached: a fresh jax.jit(lambda ...)
            # per call re-traces every time (function identity keys the
            # jit cache) — profiled at ~630 ms of host time per span,
            # i.e. 40% of the whole 50-step wall at 98k atoms
            if self._disp_jit is None:
                self._disp_jit = jax.jit(
                    lambda a, b: jnp.max(jnp.sum((a - b) ** 2, -1)))
            d = self._disp_jit(self.state.x, self.nbr.x_build)
            if float(d) > (0.5 * self.skin) ** 2:
                self.rebuild_neighbors()
        else:
            x_np = np.asarray(self.state.x)
            if self._needs_rebuild(x_np):
                self.rebuild_neighbors(x_np)

    def evaluate(self):
        """Compute forces/pe/W at the current positions (LAMMPS setup())."""
        self._ensure_neighbors()
        if self._efv_jit is None:
            self._efv_jit = jax.jit(self.pair.energy_force_virial)
        pe, force, W = self._efv_jit(
            self.state.x, self.state.type, self.nbr, self.state.box.h)
        self.state = self.state.replace(f=force)
        self._f_valid = True
        return pe, W

    def _setup_forces(self):
        """Make state.f valid for the next segment's initial half-kick.

        After any completed segment, state.f already holds the forces at
        the final positions (the step computes forces before
        final_integrate), so recomputing them — let alone the full
        energy/virial pass evaluate() runs — is redundant.  The full pass
        costs ~330 ms at 98k atoms on TPU (measured), i.e. 6+ ms/step at
        50-step benching granularity.
        """
        self._ensure_neighbors()
        if getattr(self, "_f_valid", False):
            return
        if self._force_jit is None:
            self._force_jit = jax.jit(self.pair.forces)
        force = self._force_jit(self.state.x, self.state.type, self.nbr,
                                self.state.box.h)
        self.state = self.state.replace(f=force)
        self._f_valid = True

    def memory_usage(self) -> dict:
        """Device-array bytes by subsystem — the analogue of LAMMPS's
        per-rank 'Memory usage' line + Pair::memory_usage
        (pair_aeam.cpp:996-1002, pair_rebomos.cpp:1113-1124)."""

        def tree_bytes(tree):
            return sum(a.size * a.dtype.itemsize
                       for a in jax.tree_util.tree_leaves(tree)
                       if hasattr(a, "dtype"))

        out = {"state_mb": tree_bytes(self.state) / 2 ** 20,
               "neighbor_mb": (tree_bytes(self.nbr) if self.nbr else 0)
               / 2 ** 20,
               "pair_tables_mb": tree_bytes(
                   {k: v for k, v in vars(self.pair).items()
                    if hasattr(v, "dtype")}) / 2 ** 20}
        out["total_mb"] = sum(out.values())
        return out

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
            on_thermo: Callable[[dict], None] | None = None,
            callbacks: Sequence[tuple] = ()):
        """Run `nsteps`; collect thermo rows every `thermo_every` steps
        (including step 0, like LAMMPS).

        callbacks: (every, fn) pairs; fn(state) fires whenever the step
        count crosses a multiple of `every` (dump files, periodic restart).
        """
        self.timers.start_run(self.state.natoms)
        self._setup_forces()
        rows = []

        def emit():
            with self.timers.section("Output"):
                if self._ev_jit is None:
                    self._ev_jit = jax.jit(self.pair.energy_virial)
                pe, W = self._ev_jit(self.state.x, self.state.type,
                                     self.nbr, self.state.box.h)
                row = self._thermo(self.state, pe, W)
            rows.append(row)
            if on_thermo:
                on_thermo(row)

        if thermo_every:
            emit()
        for every, fn in callbacks:
            with self.timers.section("Output"):
                fn(self.state)

        half_skin_sq = (0.5 * self.skin) ** 2
        done = 0
        while done < nsteps:
            span = nsteps - done
            if thermo_every:
                span = min(span, thermo_every - (done % thermo_every))
            for every, _ in callbacks:
                span = min(span, every - (done % every))

            fused = getattr(self, "fused_loop", None)
            if fused is None:      # default: on for real accelerators (the
                # host loop is kept on CPU so the f64 test suite compiles
                # the small graphs; force with eng.fused_loop = True)
                fused = jax.default_backend() not in ("cpu",)
            if fused and self.device_rebuild and span >= self.check_every:
                # fused multi-segment device loop: segments + rebuilds in
                # one dispatch, one host sync per span (tunnel RTT ~35 ms).
                # Span capped so a rare in-loop overflow (which discards
                # and re-runs the whole span) has bounded redo cost.
                m = (span // self.check_every) * self.check_every
                m = min(m, 16 * self.check_every)
                try:
                    with self.timers.section("Pair"):
                        self._run_span_device(m)
                except Exception as e:
                    # never die on the fused path: fall back to the
                    # per-segment host loop (same physics, more host
                    # round-trips) and keep going
                    import warnings
                    warnings.warn(f"fused device loop failed ({e!r}); "
                                  "falling back to the host loop")
                    self.fused_loop = False
                    continue
                done += m
                if thermo_every and done % thermo_every == 0:
                    emit()
                for every, fn in callbacks:
                    if done % every == 0:
                        with self.timers.section("Output"):
                            fn(self.state)
                continue

            seg = min(self.check_every, span)

            start_state = self.state
            with self.timers.section("Pair"):
                new_state, maxdisp_sq = self._segment(
                    self.state, self.nbr, seg)
                disp_tripped = float(maxdisp_sq) > half_skin_sq

            if disp_tripped:
                # mid-segment half-skin violation possible: redo exactly
                self.state = start_state
                with self.timers.section("Neigh"):
                    self.rebuild_neighbors()
                with self.timers.section("Pair"):
                    new_state, maxdisp_sq = self._segment(
                        self.state, self.nbr, seg)
                    still_tripped = float(maxdisp_sq) > half_skin_sq
                self.state = new_state
                if still_tripped:
                    # moved > skin/2 within one fresh segment; rebuild so
                    # the *next* segment starts valid
                    with self.timers.section("Neigh"):
                        self.rebuild_neighbors()
            else:
                self.state = new_state
                # predictive proactive rebuild: extrapolate one segment of
                # displacement growth; if the NEXT segment would cross the
                # half-skin bound it would be discarded and re-run (2x its
                # cost on hot systems, e.g. sample.in at 863 K trips every
                # ~25 steps).  Rebuilding now costs one warm rebuild
                # instead of a redone segment.  Same rule as the fused
                # device loop (_device_loop_fn).
                d_now = float(maxdisp_sq) ** 0.5
                growth = max(d_now - getattr(self, "_seg_dprev", 0.0), 0.0)
                self._seg_dprev = d_now
                if d_now + growth > 0.95 * half_skin_sq ** 0.5:
                    with self.timers.section("Neigh"):
                        self.rebuild_neighbors()
                    self._seg_dprev = 0.0

            done += seg
            if thermo_every and done % thermo_every == 0:
                emit()
            for every, fn in callbacks:
                if done % every == 0:
                    with self.timers.section("Output"):
                        fn(self.state)

        self.timers.end_run(nsteps)
        self.thermo_rows = rows
        return rows
