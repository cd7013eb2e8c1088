"""Production spatial decomposition — slab-sharded MD with migration.

The TPU-native equivalent of LAMMPS's MPI domain decomposition + Comm
(SURVEY.md sections 2.4/5.8), built so every shard reuses the SINGLE-CHIP
machinery wholesale:

  * Each device owns one domain of a (Px, Py) processor grid (default
    x-slabs; the LAMMPS `processors` analogue — the reference's 4-rank
    golden run used a 2x2x1 grid, log.rebomos-bulk.4:22).  The local atom
    block is [owned (n_cap) | x halos (2*Bhx) | y halos (2*Bhy)] — halo
    atoms are copies of boundary atoms from adjacent domains, refreshed
    every step by `lax.ppermute`s over ICI (the analogue of forward
    position communication).  2-D grids exchange in two stages (x, then
    y over the [owned | x-halo] block), so corner halos need no extra
    diagonal communication.
  * Neighbor lists, cell tables and mirror tables are built PER SHARD by
    the same jitted `device_rebuild` used single-chip, on a "slab box":
    the global cell sliced along x (non-periodic, the halo margin baked
    into the box) with y/z periodicity intact.  Halo atoms are passed as
    pseudo-owned rows, so the per-shard force evaluation — including the
    Pallas kernels — needs NO reverse force communication: every edge
    incident to an owned atom, and its mirror, is present locally
    (REBOMOS's own REQ_GHOST design, pair_rebomos.cpp:304, taken to its
    conclusion).  The halo width is pair.ghost_margin(skin), which covers
    the many-body environment of halo centers (LAMMPS cutghost analogue).
  * Migration (LAMMPS Comm::exchange): at every reneighbor event, atoms
    whose slab changed are packed into fixed-capacity buffers and
    ppermuted to the adjacent shard; all packing is cumsum-compaction
    scatters (no host loops, no dynamic shapes).
  * Reductions (thermo energy, thermostat kinetic energy, bfield tallies)
    are `lax.psum` over the mesh axis — MPI_Allreduce (fix_bfield.cpp:545).

Fixed capacities (slab atoms n_cap, halo Bh, migration B) are sized from
the initial configuration with slack; overflow flags are psum'd out of the
jitted resettle and trigger a host-side re-size + retrace, exactly like the
single-chip engine's plan recovery.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.box import Box
from ..core.state import State
from ..core.units import UnitSystem
from ..fixes.base import Fix, StepContext
from ..neighbor import device_build
from ..potentials.base import PairStyle

AXIS = "spatial"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardState:
    """Sharded atom state; every leaf's leading axis is the device axis."""

    x: jnp.ndarray        # [Pn, n_cap, 3]
    v: jnp.ndarray        # [Pn, n_cap, 3]
    f: jnp.ndarray        # [Pn, n_cap, 3]
    type: jnp.ndarray     # [Pn, n_cap]
    q: jnp.ndarray        # [Pn, n_cap]
    tag: jnp.ndarray      # [Pn, n_cap] global atom id (for gather-back)
    image: jnp.ndarray    # [Pn, n_cap, 3]
    valid: jnp.ndarray    # [Pn, n_cap]
    step: jnp.ndarray     # [Pn] per-shard copy of the timestep
    extras: Dict          # per-shard fix state ([Pn, ...] leaves)

    def tree_flatten(self):
        return ((self.x, self.v, self.f, self.type, self.q, self.tag,
                 self.image, self.valid, self.step, self.extras), None)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class HaloTables:
    """Static-between-rebuilds halo exchange tables (leading axis = device).

    exp_r/exp_l: slot indices of my atoms exported to the right/left
    neighbor (they become its left/right halo).  t_loc/valid_loc describe
    the [owned | left halo | right halo] local block."""

    exp_r: jnp.ndarray        # [Pn, Bhx] int32 slots (x stage, owned block)
    exp_l: jnp.ndarray        # [Pn, Bhx]
    val_hl: jnp.ndarray       # [Pn, Bhx] validity of my LEFT halo rows
    val_hr: jnp.ndarray       # [Pn, Bhx]
    t_loc: jnp.ndarray        # [Pn, n_loc] types of the local block
    valid_loc: jnp.ndarray    # [Pn, n_loc]
    q_loc: jnp.ndarray        # [Pn, n_loc] charges of the local block
                              # (static between rebuilds, like types)
    #: y-stage halo tables (2-D decomposition; [Pn, 0] when Py == 1).
    #: exp_u/exp_d index the [owned | x-halo] block, so corner halos
    #: arrive through the standard two-stage exchange.
    exp_u: jnp.ndarray = None  # [Pn, Bhy]
    exp_d: jnp.ndarray = None  # [Pn, Bhy]
    val_hd: jnp.ndarray = None
    val_hu: jnp.ndarray = None

    def tree_flatten(self):
        return ((self.exp_r, self.exp_l, self.val_hl, self.val_hr,
                 self.t_loc, self.valid_loc, self.q_loc,
                 self.exp_u, self.exp_d, self.val_hd, self.val_hu), None)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


def _sq(tree):
    """Strip the leading size-1 axis shard_map hands each device."""
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def _smap_kwargs():
    """Extra jax.shard_map kwargs for the engine's sharded programs.

    Pallas interpret mode (LPT_PALLAS=interpret, the CPU-test escape
    hatch) discharges kernels into plain jax ops whose internal grid
    bookkeeping mixes axis-varying and unvarying values; JAX's vma
    checker rejects that mix inside shard_map, so the escape hatch
    relaxes it.  Production (compiled kernels, opaque to the checker)
    keeps check_vma strict."""
    import os
    if os.environ.get("LPT_PALLAS") == "interpret":
        return {"check_vma": False}
    return {}


def _pack(mask, cap, arrs):
    """Compact masked rows to the front of fixed-capacity arrays.

    Returns (packed arrays, count, overflow).  Deterministic scatter with
    unique targets; overflowing rows are dropped (and flagged)."""
    tgt = jnp.cumsum(mask.astype(jnp.int32)) - 1
    cnt = jnp.sum(mask)
    tgt = jnp.where(mask & (tgt < cap), tgt, cap)
    out = []
    for a in arrs:
        shape = (cap,) + a.shape[1:]
        out.append(jnp.zeros(shape, a.dtype).at[tgt].set(
            jnp.where(mask.reshape((-1,) + (1,) * (a.ndim - 1)), a, 0),
            mode="drop"))
    return out, cnt, cnt > cap


def _merge(mask_rows, base, cap, dst_list, src_list):
    """Scatter valid src rows into dst starting at slot `base`."""
    tgt = base + jnp.cumsum(mask_rows.astype(jnp.int32)) - 1
    tgt = jnp.where(mask_rows & (tgt < cap), tgt, cap)
    out = []
    for dst, src in zip(dst_list, src_list):
        out.append(dst.at[tgt].set(
            jnp.where(mask_rows.reshape((-1,) + (1,) * (src.ndim - 1)),
                      src, 0), mode="drop"))
    return out, jnp.sum(mask_rows)


class ShardedEngine:
    """Multi-device slab engine mirroring run/simulation.Engine's API."""

    def __init__(self, state: State, pair: PairStyle, fixes: Sequence[Fix],
                 units: UnitSystem, n_devices: int | None = None,
                 dt: float | None = None, skin: float | None = None,
                 check_every: int = 10, slack: float = 1.4,
                 grid: "tuple[int, int] | None" = None):
        """grid: (Px, Py) processor grid (the LAMMPS `processors` analogue;
        the reference's own 4-rank golden run used a 2x2x1 grid,
        log.rebomos-bulk.4:22).  Default (n_devices, 1) = x slabs; Py > 1
        splits y too, lifting the slab-width floor on compact boxes.
        Devices are laid out row-major: d = dx * Py + dy."""
        self.pair = pair.for_sharded()
        self.fixes = list(fixes)
        self.units = units
        self.skin = skin if skin is not None else units.skin
        self.check_every = check_every
        self.slack = slack
        devices = jax.devices()
        Pn = n_devices or len(devices)
        if grid is None:
            grid = (Pn, 1)
        if grid[0] * grid[1] != Pn:
            raise ValueError(f"grid {grid} does not tile {Pn} devices")
        if grid[0] < 1 or grid[1] < 1 or (grid[0] == 1 and grid[1] == 1):
            raise ValueError(f"invalid processor grid {grid}")
        self.grid = (int(grid[0]), int(grid[1]))
        if Pn < 2:
            raise ValueError("ShardedEngine needs >= 2 devices; "
                             "use run.simulation.Engine single-device")
        self.n_devices = Pn
        self.mesh = Mesh(np.array(devices[:Pn]), (AXIS,))
        self.ctx = StepContext(units=units,
                               dt=dt if dt is not None else units.dt,
                               axis=AXIS, natoms_global=state.natoms)
        self.box = state.box
        self.natoms = state.natoms
        self.dtype = state.x.dtype
        self._setup_geometry(state)
        self._pack_initial(state)
        self._setup_fix_extras(state)
        self._make_plan()
        self.halo = None
        self.nbr = None
        self._resettle_jit = None
        self._seg_jit = None
        self._loop_jit = None
        self._ev_jit = None
        self.pair.prepare(np.asarray(state.type))
        self.thermo_rows: List[dict] = []
        from ..run.timers import Timers
        self.timers = Timers()

    def _pair_local(self, halo: HaloTables):
        """Pair style bound to this shard's local charges.

        Charge-consuming styles (needs_charges) get a per-trace view whose
        charge array is the [owned | halo] local block — the sharded
        analogue of Engine's one-time bind_charges(state.q).  The view is
        created inside the traced local function, so the bound array is
        the current trace's tracer (never cached across traces)."""
        if self.pair.needs_charges:
            return self.pair.with_charges(halo.q_loc)
        return self.pair

    # -- host-side setup ---------------------------------------------------
    def _setup_geometry(self, state: State):
        box = state.box
        h = box.h_np()
        lo = box.lo_np()
        widths = box.perpendicular_widths_np()
        Px, Py = self.grid
        margin = self.pair.ghost_margin(self.skin)
        mfs = [0.0, 0.0]
        hs = h.copy()
        for ax, P in ((0, Px), (1, Py)):
            if P <= 1:
                continue
            if not box.periodic[ax]:
                raise ValueError(
                    f"slab decomposition requires periodic axis {ax}")
            mfs[ax] = margin / widths[ax]
            slab_w = widths[ax] / P
            if slab_w < margin:
                raise ValueError(
                    f"slab width {slab_w:.2f} A < halo margin "
                    f"{margin:.2f} A: box too small in axis {ax} for "
                    f"{P}-way decomposition")
            # slab box: slice of the global cell along this axis, halo
            # margins baked in, non-periodic (halos are explicit atoms)
            hs[ax] = h[ax] * (1.0 / P + 2.0 * mfs[ax])
        self.margin_frac = tuple(mfs)
        self.slab_box = Box(
            h=jnp.asarray(hs, self.dtype),
            lo=jnp.asarray(lo, self.dtype),
            periodic=(Px == 1 and box.periodic[0],
                      Py == 1 and box.periodic[1], box.periodic[2]),
            h64=Box._master(hs), lo64=Box._master(lo))
        los = np.stack([
            lo + (dx / Px - mfs[0]) * h[0] + (dy / Py - mfs[1]) * h[1]
            for dx in range(Px) for dy in range(Py)])
        self._lo_shards = jnp.asarray(los, self.dtype)       # [Pn, 3]
        self._h_glob = jnp.asarray(h, self.dtype)
        self._hinv_glob = jnp.asarray(np.linalg.inv(h), self.dtype)
        self._lo_glob = jnp.asarray(lo, self.dtype)
        self._h_slab = jnp.asarray(hs, self.dtype)
        self._hinv_slab = jnp.asarray(np.linalg.inv(hs), self.dtype)
        self._arow = jnp.asarray(h[0], self.dtype)           # global a vector
        self._brow = jnp.asarray(h[1], self.dtype)           # global b vector

    def _perms(self):
        """Flattened-axis permutations for the (Px, Py) grid: x-forward,
        x-backward, y-forward (up), y-backward (down)."""
        Px, Py = self.grid

        def flat(ix, iy):
            return ix * Py + iy

        ids = [(ix, iy) for ix in range(Px) for iy in range(Py)]
        perm_xr = [(flat(ix, iy), flat((ix + 1) % Px, iy)) for ix, iy in ids]
        perm_xl = [(flat(ix, iy), flat((ix - 1) % Px, iy)) for ix, iy in ids]
        perm_yu = [(flat(ix, iy), flat(ix, (iy + 1) % Py)) for ix, iy in ids]
        perm_yd = [(flat(ix, iy), flat(ix, (iy - 1) % Py)) for ix, iy in ids]
        return perm_xr, perm_xl, perm_yu, perm_yd

    def _pack_initial(self, state: State):
        Pn = self.n_devices
        Px, Py = self.grid
        x_np, image_np = state.box.wrap_np(np.asarray(state.x),
                                           np.asarray(state.image))
        h = state.box.h_np()
        lo = state.box.lo_np()
        frac = (x_np - lo) @ np.linalg.inv(h)
        N = self.natoms
        sxf = frac[:, 0] * Px
        syf = frac[:, 1] * Py
        sx = np.clip(sxf.astype(np.int64), 0, Px - 1)
        sy = np.clip(syf.astype(np.int64), 0, Py - 1)
        slab_of = sx * Py + sy
        counts = np.bincount(slab_of, minlength=Pn)
        n_cap = int(-(-int(counts.max() * self.slack) // 8) * 8)
        self.n_cap = max(getattr(self, "n_cap", 0), n_cap, 8)
        # halo capacities from the measured per-boundary populations:
        # x stage exports owned boundary bands; y stage exports bands of
        # the [owned | x-halo] block (margin-expanded x range)
        mfx, mfy = self.margin_frac
        hx, hy = [0], [0]
        for dx in range(Px):
            # signed cyclic x distance from this column's slab start
            dxf = np.mod(sxf - dx + Px / 2.0, Px) - Px / 2.0
            in_x = (dxf >= 0) & (dxf < 1.0)
            in_x_exp = (dxf >= -mfx * Px) & (dxf <= 1.0 + mfx * Px)
            for dy in range(Py):
                dyf = np.mod(syf - dy + Py / 2.0, Py) - Py / 2.0
                in_y = (dyf >= 0) & (dyf < 1.0)
                own = in_x & in_y
                if Px > 1:
                    hx.append((own & (dxf <= mfx * Px)).sum())
                    hx.append((own & (dxf >= 1.0 - mfx * Px)).sum())
                if Py > 1:
                    hy.append((in_x_exp & in_y
                               & (dyf <= mfy * Py)).sum())
                    hy.append((in_x_exp & in_y
                               & (dyf >= 1.0 - mfy * Py)).sum())
        def cap(v):
            return max(8, int(-(-int(v * self.slack) // 8) * 8))
        self.Bhx = (max(getattr(self, "Bhx", 0), cap(max(hx)))
                    if Px > 1 else 0)
        self.Bhy = (max(getattr(self, "Bhy", 0), cap(max(hy)))
                    if Py > 1 else 0)
        self.Bh = self.Bhx          # back-compat alias (x-stage halo cap)
        self.B_mig = max(8, -(-self.n_cap // 8) * 2)  # ~25% of slab
        self.n_loc = self.n_cap + 2 * self.Bhx + 2 * self.Bhy

        order = np.argsort(slab_of, kind="stable")
        starts = np.zeros(Pn + 1, np.int64)
        starts[1:] = np.cumsum(counts)
        slot = np.arange(N) - starts[slab_of[order]]
        d_all = slab_of[order]

        def packed(a_np, fill=0.0, dt=None):
            a_np = np.asarray(a_np)
            shape = (Pn, self.n_cap) + a_np.shape[1:]
            out = np.full(shape, fill, dtype=dt or a_np.dtype)
            out[d_all, slot] = a_np[order]
            return out

        xs = packed(x_np)
        valid = np.zeros((Pn, self.n_cap), bool)
        valid[d_all, slot] = True
        # park pads far outside every slab box along +x
        park = lo + 2.0 * h[0]
        xs[~valid] = park
        self.shards = ShardState(
            x=jnp.asarray(xs, self.dtype),
            v=jnp.asarray(packed(np.asarray(state.v)), self.dtype),
            f=jnp.asarray(packed(np.asarray(state.f)), self.dtype),
            type=jnp.asarray(packed(np.asarray(state.type), 1), jnp.int32),
            q=jnp.asarray(packed(np.asarray(state.q)), self.dtype),
            tag=jnp.asarray(packed(np.arange(N), -1), jnp.int32),
            image=jnp.asarray(packed(image_np, 0), jnp.int32),
            valid=jnp.asarray(valid),
            step=jnp.broadcast_to(jnp.asarray(state.step, jnp.int32),
                                  (Pn,)),
            extras={})
        self._mass = jnp.asarray(np.asarray(state.mass), self.dtype)

    def _setup_fix_extras(self, state: State):
        """Create per-shard fix extras by running setup on a local-shaped
        template, then tiling across the device axis."""
        Pn = self.n_devices
        tmpl = State(
            x=self.shards.x[0], v=self.shards.v[0], f=self.shards.f[0],
            type=self.shards.type[0], q=self.shards.q[0],
            image=self.shards.image[0], mass=self._mass, box=self.box,
            step=jnp.asarray(0, jnp.int32), extras={})
        for f in self.fixes:
            tmpl = f.setup(tmpl, dataclasses.replace(self.ctx, axis=None))
        extras = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (Pn,) + a.shape), tmpl.extras)
        self.shards = self.shards.replace(extras=extras)

    def _make_plan(self):
        requests = self.pair.neighbor_requests()
        Px, Py = self.grid
        mfx, mfy = self.margin_frac
        natoms_est = int(self.natoms * (1.0 / Px + 2 * mfx)
                         * (1.0 / Py + 2 * mfy) * 1.1) + 8
        self._plan = device_build.make_plan_from_density(
            self.slab_box, requests, self.skin, natoms_est,
            slack=max(self.slack, 1.5),
            cell_tiers=getattr(self.pair, "cell_tiers", ()),
            mirror_tiers=getattr(self.pair, "mirror_tiers", ()))
        self._cut_mats = {k: jnp.asarray(v, self.dtype)
                          for k, v in requests.items()}

    # -- jitted resettle (wrap + migrate + halo + per-shard rebuild) -------
    def _build_resettle(self):
        Px, Py = self.grid
        n_cap, B = self.n_cap, self.B_mig
        Bhx, Bhy = self.Bhx, self.Bhy
        plan = self._plan
        cut_mats = self._cut_mats
        h_g, hinv_g, lo_g = self._h_glob, self._hinv_glob, self._lo_glob
        h_s, hinv_s = self._h_slab, self._hinv_slab
        lo_shards = self._lo_shards
        arow, brow = self._arow, self._brow
        mfx, mfy = self.margin_frac
        park = lo_g + 2.0 * (arow if Px > 1 else brow)
        perm_xr, perm_xl, perm_yu, perm_yd = self._perms()

        def mv3(v, m):
            return jnp.stack(
                [v[:, 0] * m[0, a] + v[:, 1] * m[1, a] + v[:, 2] * m[2, a]
                 for a in range(3)], axis=1)

        def migrate_axis(rows, valid, s_row, my_i, P, perm_f, perm_b):
            """One exchange stage along one grid axis.  Atoms more than
            one slab away are dropped (counted lost, Comm::exchange
            semantics).  Returns (packed rows, n_new, overflow, lost)."""
            dl = jnp.mod(s_row - my_i, P)
            stay = valid & (dl == 0)
            go_f = valid & (dl == 1)
            if P == 2:
                # dl==1 is both neighbors (same peer): route all movers
                # through the forward exchange
                go_b = jnp.zeros_like(go_f)
            else:
                go_b = valid & (dl == P - 1)
            lost = valid & ~stay & ~go_f & ~go_b
            kept, nk, ov_keep = _pack(stay, n_cap, rows)
            sf, cf, ov_f = _pack(go_f, B, rows)
            sb, cb, ov_b = _pack(go_b, B, rows)
            vf = jnp.arange(B) < cf
            vb = jnp.arange(B) < cb
            recv_b = [jax.lax.ppermute(a, AXIS, perm_f) for a in sf]
            rv_b = jax.lax.ppermute(vf, AXIS, perm_f)
            recv_f = [jax.lax.ppermute(a, AXIS, perm_b) for a in sb]
            rv_f = jax.lax.ppermute(vb, AXIS, perm_b)
            kept, c1 = _merge(rv_b, nk, n_cap, kept, recv_b)
            kept, c2 = _merge(rv_f, nk + c1, n_cap, kept, recv_f)
            n_new = nk + c1 + c2
            ov = ov_keep | ov_f | ov_b | (n_new > n_cap)
            return kept, n_new, ov, jnp.sum(lost)

        def halo_axis(xb, tb, qb, validb, s_loc, mf, P, perm_f, perm_b,
                      Bh, axis_row, my_i):
            """One halo-exchange stage: export boundary bands of the
            given block to the two axis neighbors; return (halo arrays
            low side, high side, export tables)."""
            exp_lo = validb & (s_loc <= mf * P)
            exp_hi = validb & (s_loc >= 1.0 - mf * P)
            slots = jnp.arange(xb.shape[0], dtype=jnp.int32)
            (ehi_idx, ehi_t, ehi_q), nchi, ov_hi = _pack(
                exp_hi, Bh, (slots, tb, qb))
            (elo_idx, elo_t, elo_q), nclo, ov_lo = _pack(
                exp_lo, Bh, (slots, tb, qb))
            val_ehi = jnp.arange(Bh) < nchi
            val_elo = jnp.arange(Bh) < nclo
            # my low-side halo = backward neighbor's high export
            val_hlo = jax.lax.ppermute(val_ehi, AXIS, perm_f)
            t_hlo = jax.lax.ppermute(ehi_t, AXIS, perm_f)
            q_hlo = jax.lax.ppermute(ehi_q, AXIS, perm_f)
            x_hlo = jax.lax.ppermute(xb[ehi_idx], AXIS, perm_f)
            val_hhi = jax.lax.ppermute(val_elo, AXIS, perm_b)
            t_hhi = jax.lax.ppermute(elo_t, AXIS, perm_b)
            q_hhi = jax.lax.ppermute(elo_q, AXIS, perm_b)
            x_hhi = jax.lax.ppermute(xb[elo_idx], AXIS, perm_b)
            lo_shift = jnp.where(my_i == 0, -1.0, 0.0).astype(self.dtype)
            hi_shift = jnp.where(my_i == P - 1, 1.0, 0.0).astype(self.dtype)
            x_hlo = jnp.where(val_hlo[:, None],
                              x_hlo + lo_shift * axis_row[None, :],
                              park[None, :])
            x_hhi = jnp.where(val_hhi[:, None],
                              x_hhi + hi_shift * axis_row[None, :],
                              park[None, :])
            return ((x_hlo, jnp.where(val_hlo, t_hlo, 1),
                     jnp.where(val_hlo, q_hlo, 0.0), val_hlo),
                    (x_hhi, jnp.where(val_hhi, t_hhi, 1),
                     jnp.where(val_hhi, q_hhi, 0.0), val_hhi),
                    (ehi_idx, elo_idx),
                    jnp.maximum(nchi, nclo), ov_hi | ov_lo)

        def local(ss):
            ss = _sq(ss)
            d = jax.lax.axis_index(AXIS)
            dxi = d // Py
            dyi = d % Py
            valid = ss.valid
            # global wrap (Domain::pbc) + image bookkeeping
            fg = mv3(ss.x - lo_g, hinv_g)
            shift = jnp.floor(fg)
            per = jnp.asarray([1.0 if p else 0.0
                               for p in self.box.periodic], self.dtype)
            shift = shift * per[None, :]
            xw = mv3(fg - shift, h_g) + lo_g
            image = ss.image + shift.astype(jnp.int32)
            fw = fg - shift

            rows = (xw, ss.v, ss.f, image, ss.type.astype(jnp.int32),
                    ss.q, ss.tag)
            ov_mig = jnp.zeros((), bool)
            lost = jnp.zeros((), jnp.int32)
            n_true = jnp.sum(valid)   # unclipped post-migration demand
            if Px > 1:
                sx = jnp.clip((fw[:, 0] * Px).astype(jnp.int32), 0, Px - 1)
                rows, n_new, ov, l_ = migrate_axis(
                    rows, valid, sx, dxi, Px, perm_xr, perm_xl)
                valid = jnp.arange(n_cap) < n_new
                n_true = n_new
                ov_mig |= ov
                lost += l_
            if Py > 1:
                # recompute the y slab of the (possibly x-migrated) rows
                fy = mv3(rows[0] - lo_g, hinv_g)[:, 1]
                sy = jnp.clip((fy * Py).astype(jnp.int32), 0, Py - 1)
                rows, n_new, ov, l_ = migrate_axis(
                    rows, valid, sy, dyi, Py, perm_yu, perm_yd)
                valid = jnp.arange(n_cap) < n_new
                n_true = n_new
                ov_mig |= ov
                lost += l_

            x2, v2, f2, im2, t2, q2, tag2 = rows
            valid2 = valid
            x2 = jnp.where(valid2[:, None], x2, park[None, :])
            t2 = jnp.where(valid2, t2, 1)
            tag2 = jnp.where(valid2, tag2, -1)

            # halo stage X: boundary bands of the settled owned block
            fw2 = mv3(x2 - lo_g, hinv_g)
            blocks_x, blocks_t, blocks_q, blocks_v = [x2], [t2], [q2], \
                [valid2]
            exp_r = exp_l = jnp.zeros((0,), jnp.int32)
            val_hl = val_hr = jnp.zeros((0,), bool)
            nch_x = jnp.zeros((), jnp.int32)
            ov_hx = jnp.zeros((), bool)
            if Px > 1:
                sl_x = fw2[:, 0] * Px - dxi.astype(self.dtype)
                lo_h, hi_h, (exp_r, exp_l), nch_x, ov_hx = halo_axis(
                    x2, t2, q2, valid2, sl_x, mfx, Px, perm_xr, perm_xl,
                    Bhx, arow, dxi)
                for h_ in (lo_h, hi_h):
                    blocks_x.append(h_[0])
                    blocks_t.append(h_[1])
                    blocks_q.append(h_[2])
                    blocks_v.append(h_[3])
            xb = jnp.concatenate(blocks_x, axis=0)
            tb = jnp.concatenate(blocks_t)
            qb = jnp.concatenate(blocks_q)
            vb = jnp.concatenate(blocks_v)

            # halo stage Y over the [owned | x-halo] block: corner halos
            # arrive as y-exports of x-halo rows
            exp_u = exp_d = jnp.zeros((0,), jnp.int32)
            val_hd = val_hu = jnp.zeros((0,), bool)
            nch_y = jnp.zeros((), jnp.int32)
            ov_hy = jnp.zeros((), bool)
            if Py > 1:
                fyb = mv3(xb - lo_g, hinv_g)[:, 1]
                sl_y = fyb * Py - dyi.astype(self.dtype)
                lo_h, hi_h, (exp_u, exp_d), nch_y, ov_hy = halo_axis(
                    xb, tb, qb, vb, sl_y, mfy, Py, perm_yu, perm_yd,
                    Bhy, brow, dyi)
                xb = jnp.concatenate([xb, lo_h[0], hi_h[0]], axis=0)
                tb = jnp.concatenate([tb, lo_h[1], hi_h[1]])
                qb = jnp.concatenate([qb, lo_h[2], hi_h[2]])
                vb = jnp.concatenate([vb, lo_h[3], hi_h[3]])
                val_hd, val_hu = lo_h[3], hi_h[3]
            if Px > 1:
                val_hl = blocks_v[1]
                val_hr = blocks_v[2]

            x_loc, t_loc, q_loc, valid_loc = xb, tb, qb, vb
            lo_d = lo_shards[d]
            zero_im = jnp.zeros((x_loc.shape[0], 3), jnp.int32)
            xw_loc, _, nbr, flags = device_build.device_rebuild(
                plan, x_loc, zero_im, t_loc, h_s, hinv_s, lo_d, cut_mats,
                valid=valid_loc)

            flags = dict(flags)
            flags["mig_overflow"] = ov_mig
            flags["halo_overflow"] = ov_hx | ov_hy
            flags["lost_atoms"] = lost
            # unclipped demand (not sum(valid2), which caps at n_cap) so
            # _grow can size n_cap from the real requirement in one step
            flags["count:slab"] = n_true
            flags["count:halo"] = nch_x
            flags["count:haloy"] = nch_y
            flags = {k: jax.lax.pmax(jnp.asarray(v).astype(jnp.int32), AXIS)
                     for k, v in flags.items()}

            ss2 = ss.replace(x=x2, v=v2, f=f2, image=im2, type=t2, q=q2,
                             tag=tag2, valid=valid2)
            halo = HaloTables(exp_r=exp_r, exp_l=exp_l,
                              val_hl=val_hl, val_hr=val_hr,
                              t_loc=t_loc, valid_loc=valid_loc,
                              q_loc=q_loc,
                              exp_u=exp_u, exp_d=exp_d,
                              val_hd=val_hd, val_hu=val_hu)
            exp = lambda t: jax.tree_util.tree_map(lambda a: a[None], t)
            return exp(ss2), exp(halo), exp(nbr), flags

        spec = P(AXIS)
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(spec,),
            out_specs=(spec, spec, spec, P()), **_smap_kwargs()))

    def resettle(self, _retry=0):
        """Wrap + migrate + rebuild halos and neighbor structures."""
        import time as _time
        warm = self._resettle_jit is not None
        if not warm:
            self._resettle_jit = self._build_resettle()
        t0 = _time.perf_counter()
        ss, halo, nbr, flags = self._resettle_jit(self.shards)
        flags_np = jax.device_get(flags)
        if warm:
            # warm per-resettle cost: used to attribute fused-span time
            # to the Neigh section (log.rebomos-bulk.1:62-70)
            self._resettle_cost = _time.perf_counter() - t0
        if int(flags_np["lost_atoms"]):
            raise RuntimeError(
                f"{int(flags_np['lost_atoms'])} atoms moved more than one "
                f"slab between reneighbor events — check_every too large")
        bad = [k for k, v in flags_np.items()
               if ("overflow" in k) and bool(v)]
        if bad:
            if _retry >= 5:
                raise RuntimeError(f"sharded rebuild overflow persists: "
                                   f"{flags_np}")
            import logging
            logging.getLogger(__name__).info(
                "sharded capacity regrow (retry %d): %s, counts %s",
                _retry, bad,
                {k: int(v) for k, v in flags_np.items()
                 if k.startswith("count:")})
            self._grow(flags_np, bad)
            return self.resettle(_retry + 1)
        self.shards = ss
        self.halo = halo
        self.nbr = nbr
        self._flags = flags_np
        self._pending_rebuild = False

    def _grow(self, flags_np, bad):
        """Re-size capacities from measured counts and retrace."""
        grow = 1.5
        if "mig_overflow" in bad:
            self.B_mig = -(-int(self.B_mig * grow) // 8) * 8
        if "halo_overflow" in bad or "ghost_overflow" in bad \
                or any(k.startswith("k_overflow") for k in bad) \
                or "cell_overflow" in bad or "candcell_overflow" in bad:
            pass
        requests = self.pair.neighbor_requests()
        # kmax high-water mark (see Engine._note_k_counts): never re-size
        # below a count any shard has already measured — stops the
        # grow<->tighten retrace oscillation on hot systems
        hwm = getattr(self, "_k_hwm", {})
        for k, v in flags_np.items():
            if k.startswith("count:k:"):
                name = k.split(":", 2)[2]
                hwm[name] = max(hwm.get(name, 0), int(v))
        self._k_hwm = hwm
        k_counts = {name: max(16, -(-(v + 2) // 16) * 16)
                    for name, v in hwm.items()}
        if any(k.startswith("k_overflow") for k in bad):
            k_counts = {k: -(-int(v * grow) // 16) * 16
                        for k, v in k_counts.items()}
        w_needed = max([int(v) for k, v in flags_np.items()
                        if k.startswith("count:mirwin:")] or [0])
        if any(k.startswith("mirwin_overflow") and bool(v)
               for k, v in flags_np.items()):
            w_needed = int(w_needed * grow)
        mir_w, mir_b = device_build.choose_mirror_window(
            self.n_cap, w_needed)
        self._plan = device_build.make_plan(
            self.slab_box, requests, self.skin,
            int(flags_np["count:ghost"] * grow) + 8,
            int(flags_np["count:cell"] * grow) + 4,
            k_counts, slack=grow, k_final=True,
            cell_tiers=getattr(self.pair, "cell_tiers", ()),
            mirror_tiers=getattr(self.pair, "mirror_tiers", ()),
            cand_occupancy=int(flags_np.get("count:candcell", 4) * grow) + 4,
            mirror_window=mir_w, mirror_chunk=mir_b)
        # slab/halo growth (capacity changes require repacking the shards)
        old_ncap = self.n_cap
        if "mig_overflow" in bad or int(flags_np["count:slab"]) > self.n_cap:
            self.n_cap = -(-int(max(flags_np["count:slab"], self.n_cap)
                                * 1.2) // 8) * 8
        if "halo_overflow" in bad:
            if self.grid[0] > 1:
                self.Bhx = -(-int(max(flags_np["count:halo"] * 1.3,
                                      self.Bhx)) // 8) * 8
            if self.grid[1] > 1:
                self.Bhy = -(-int(max(
                    flags_np.get("count:haloy", 0) * 1.3,
                    self.Bhy)) // 8) * 8
            self.Bh = self.Bhx
        self.n_loc = self.n_cap + 2 * self.Bhx + 2 * self.Bhy
        if self.n_cap != old_ncap:
            # repack the shard state at the new capacity; per-atom fix
            # extras (e.g. bfield's v0 snapshot) are step-transient and
            # reset to zeros, scalar/chain extras are preserved
            old_extras = self.shards.extras
            st = self.to_state()
            self._pack_initial(st)
            extras = jax.tree_util.tree_map(
                lambda a: (jnp.zeros(a.shape[:1] + (self.n_cap,)
                                     + a.shape[2:], a.dtype)
                           if a.ndim >= 2 and a.shape[1] == old_ncap
                           else a), old_extras)
            self.shards = self.shards.replace(extras=extras)
        self._resettle_jit = None
        self._seg_jit = None
        self._ev_jit = None
        self._force_jit = None
        self._pe_jit = None
        self._comm_cost = None      # halo capacities changed: re-probe

    # -- hot step ----------------------------------------------------------
    def _local_state(self, ss):
        # __tag__ lets group-scoped fixes resolve membership by global
        # atom id across migration (Fix.group_sel); stripped again in
        # _from_state so the persistent extras carry no stale copy
        extras = dict(ss.extras)
        extras["__tag__"] = ss.tag
        return State(x=ss.x, v=ss.v, f=ss.f, type=ss.type, q=ss.q,
                     image=ss.image, mass=self._mass, box=self.box,
                     step=ss.step, extras=extras)

    def _from_state(self, ss, st):
        extras = dict(st.extras)
        extras.pop("__tag__", None)
        return ss.replace(x=st.x, v=st.v, f=st.f, image=st.image,
                          step=st.step, extras=extras)

    def _halo_fn(self):
        """Shared per-step halo position refresh closure.

        Two-stage for 2-D grids: x-halos from the owned block, then
        y-halos (incl. corners) from the [owned | x-halo] block — the
        position-only analogue of LAMMPS forward communication."""
        Px, Py = self.grid
        perm_xr, perm_xl, perm_yu, perm_yd = self._perms()
        arow, brow = self._arow, self._brow
        park = self._lo_glob + 2.0 * (arow if Px > 1 else brow)

        def halo_positions(x, halo, d):
            dxi = d // Py
            dyi = d % Py
            if Px > 1:
                sl = jnp.where(dxi == 0, -1.0, 0.0).astype(x.dtype)
                sr = jnp.where(dxi == Px - 1, 1.0, 0.0).astype(x.dtype)
                x_hl = jax.lax.ppermute(x[halo.exp_r], AXIS, perm_xr)
                x_hr = jax.lax.ppermute(x[halo.exp_l], AXIS, perm_xl)
                x_hl = jnp.where(halo.val_hl[:, None],
                                 x_hl + sl * arow[None, :], park[None, :])
                x_hr = jnp.where(halo.val_hr[:, None],
                                 x_hr + sr * arow[None, :], park[None, :])
                x = jnp.concatenate([x, x_hl, x_hr], axis=0)
            if Py > 1:
                sd = jnp.where(dyi == 0, -1.0, 0.0).astype(x.dtype)
                su = jnp.where(dyi == Py - 1, 1.0, 0.0).astype(x.dtype)
                x_hd = jax.lax.ppermute(x[halo.exp_u], AXIS, perm_yu)
                x_hu = jax.lax.ppermute(x[halo.exp_d], AXIS, perm_yd)
                x_hd = jnp.where(halo.val_hd[:, None],
                                 x_hd + sd * brow[None, :], park[None, :])
                x_hu = jnp.where(halo.val_hu[:, None],
                                 x_hu + su * brow[None, :], park[None, :])
                x = jnp.concatenate([x, x_hd, x_hu], axis=0)
            return x

        return halo_positions

    def _build_segment(self, nsteps: int):
        n_cap = self.n_cap
        h_s = self._h_slab
        ctx = self.ctx
        halo_positions = self._halo_fn()

        def local(ss, halo, nbr):
            ss = _sq(ss)
            halo = _sq(halo)
            nbr = _sq(nbr)
            d = jax.lax.axis_index(AXIS)
            vmask = ss.valid[:, None]

            def one(ss, _):
                st = self._local_state(ss)
                for f in self.fixes:
                    st = f.initial_integrate(st, ctx)
                for f in self.fixes:
                    st = f.post_integrate(st, ctx)
                x_loc = halo_positions(st.x, halo, d)
                f_loc = self._pair_local(halo).forces(x_loc, halo.t_loc, nbr, h_s)
                st = st.replace(f=f_loc[:n_cap] * vmask)
                for f in self.fixes:
                    st = f.post_force(st, ctx)
                for f in self.fixes:
                    st = f.final_integrate(st, ctx)
                for f in self.fixes:
                    st = f.end_of_step(st, ctx)
                st = st.replace(step=st.step + 1)
                return self._from_state(ss, st), None

            ss, _ = jax.lax.scan(one, ss, None, length=nsteps)
            x_loc = halo_positions(ss.x, halo, d)
            dsp = x_loc - nbr.x_build
            d2 = jnp.sum(dsp * dsp, axis=1)
            maxd = jax.lax.pmax(
                jnp.max(jnp.where(halo.valid_loc, d2, 0.0)), AXIS)
            return jax.tree_util.tree_map(lambda a: a[None], ss), maxd

        spec = P(AXIS)
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(spec, spec, spec), out_specs=(spec, P()),
            **_smap_kwargs()))

    def _build_forces_once(self):
        """Forces-only sharded evaluation (LAMMPS setup(): make state.f
        valid before the first segment's initial half-kick)."""
        n_cap = self.n_cap
        h_s = self._h_slab
        halo_positions = self._halo_fn()

        def local(ss, halo, nbr):
            ss = _sq(ss)
            halo = _sq(halo)
            nbr = _sq(nbr)
            d = jax.lax.axis_index(AXIS)
            x_loc = halo_positions(ss.x, halo, d)
            f_loc = self._pair_local(halo).forces(x_loc, halo.t_loc, nbr, h_s)
            return (f_loc[:n_cap] * ss.valid[:, None])[None]

        spec = P(AXIS)
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(spec, spec, spec),
            out_specs=spec, **_smap_kwargs()))

    def _build_halo_probe(self):
        """Standalone per-step halo refresh (export gathers + ppermutes +
        halo assembly) — the piece of every fused step that is
        communication.  Timed once to split the Comm section out of Pair
        (the reference prints Comm = 5.67% on 4 ranks,
        log.rebomos-bulk.4:65-67; fusion makes direct in-step timing
        impossible without breaking the loop)."""
        halo_positions = self._halo_fn()

        def local(ss, halo):
            ss = _sq(ss)
            halo = _sq(halo)
            d = jax.lax.axis_index(AXIS)
            x_loc = halo_positions(ss.x, halo, d)
            return jnp.sum(x_loc)[None]

        spec = P(AXIS)
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(spec, spec),
            out_specs=spec, **_smap_kwargs()))

    def _comm_cost_estimate(self) -> float:
        """Measured warm per-step halo-exchange cost (seconds).

        This is a STANDALONE-PROBE estimate: the probe cannot observe any
        overlap of halo exchange with compute inside the fused segment,
        so the Comm row it feeds is an upper bound, not a direct in-step
        measurement (the other timer sections are).  Invalidated whenever
        halo capacities or the plan change (`_resize_from_flags`)."""
        cost = getattr(self, "_comm_cost", None)
        if cost is not None:
            return cost
        import time as _time
        probe = self._build_halo_probe()
        out = probe(self.shards, self.halo)
        jax.block_until_ready(out)
        reps = 5
        t0 = _time.perf_counter()
        for _ in range(reps):
            out = probe(self.shards, self.halo)
        jax.block_until_ready(out)
        self._comm_cost = (_time.perf_counter() - t0) / reps
        return self._comm_cost

    def _note_comm(self, nsteps: int):
        """Re-attribute the halo-exchange share of a fused span from Pair
        to Comm (same mechanism as the in-loop Neigh attribution)."""
        try:
            self.timers.transfer("Pair", "Comm",
                                 nsteps * self._comm_cost_estimate())
        except Exception:
            pass      # observability must never kill a run

    def _setup_forces(self):
        if self.nbr is None:
            self.resettle()
        if getattr(self, "_f_valid", False):
            return
        if getattr(self, "_force_jit", None) is None:
            self._force_jit = self._build_forces_once()
        f = self._force_jit(self.shards, self.halo, self.nbr)
        self.shards = self.shards.replace(f=f)
        self._f_valid = True

    # -- energy / thermo ---------------------------------------------------
    def _build_ev(self):
        n_cap = self.n_cap
        h_s = self._h_slab
        halo_positions = self._halo_fn()

        def local(ss, halo, nbr):
            ss = _sq(ss)
            halo = _sq(halo)
            nbr = _sq(nbr)
            d = jax.lax.axis_index(AXIS)

            def e_of(x, strain):
                x_loc = halo_positions(x, halo, d)
                owned = jnp.concatenate(
                    [ss.valid, jnp.zeros(x_loc.shape[0] - n_cap, bool)])
                e = self._pair_local(halo).energy(x_loc, strain, halo.t_loc, nbr, h_s,
                                     center_mask=owned)
                return jax.lax.psum(e, AXIS)

            strain0 = jnp.zeros((3, 3), ss.x.dtype)
            E, gs = jax.value_and_grad(e_of, argnums=1)(ss.x, strain0)
            m = self._mass[ss.type] * ss.valid
            v = ss.v
            kin = jnp.stack([jnp.stack(
                [jnp.sum(m * v[:, a] * v[:, b]) for b in range(3)])
                for a in range(3)])
            kin = jax.lax.psum(kin, AXIS)
            return E, -gs, kin

        spec = P(AXIS)
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(spec, spec, spec),
            out_specs=(P(), P(), P()), **_smap_kwargs()))

    def _build_pe(self):
        """Energy-only sharded evaluation (no strain grad — the virial
        backward pass costs ~5x the compile; tests and cheap monitors use
        this)."""
        n_cap = self.n_cap
        h_s = self._h_slab
        halo_positions = self._halo_fn()

        def local(ss, halo, nbr):
            ss = _sq(ss)
            halo = _sq(halo)
            nbr = _sq(nbr)
            d = jax.lax.axis_index(AXIS)
            x_loc = halo_positions(ss.x, halo, d)
            owned = jnp.concatenate(
                [ss.valid, jnp.zeros(x_loc.shape[0] - n_cap, bool)])
            e = self._pair_local(halo).energy(x_loc, None, halo.t_loc, nbr, h_s,
                                 center_mask=owned)
            return jax.lax.psum(e, AXIS)

        spec = P(AXIS)
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(spec, spec, spec),
            out_specs=P(), **_smap_kwargs()))

    def potential_energy(self) -> float:
        """Global PE via psum of owned-masked per-shard energies."""
        if self.nbr is None:
            self.resettle()
        if getattr(self, "_pe_jit", None) is None:
            self._pe_jit = self._build_pe()
        return float(self._pe_jit(self.shards, self.halo, self.nbr))

    def thermo(self) -> dict:
        """One thermo row (reductions via psum — the MPI_Allreduce
        analogue, fix_bfield.cpp:545); conventions match run/thermo.py."""
        if self.nbr is None:
            self.resettle()
        if self._ev_jit is None:
            self._ev_jit = self._build_ev()
        E, W, kin = jax.device_get(
            self._ev_jit(self.shards, self.halo, self.nbr))
        u = self.units
        N = self.natoms
        kin = u.mvv2e * np.asarray(kin, np.float64)   # kinetic tensor
        ke = 0.5 * float(np.trace(kin))
        T = 2.0 * ke / ((3 * N - 3) * u.boltz)
        vol = float(abs(np.linalg.det(self.box.h_np())))
        press = float(np.trace(kin + np.asarray(W, np.float64))) / 3.0 \
            / vol * u.nktv2p
        step = int(jax.device_get(self.shards.step)[0])
        ptens = (kin + np.asarray(W, np.float64)) / vol * u.nktv2p
        # host-side geometry (eager jnp ops each cost a tunnel round-trip)
        alpha, beta, gamma = self.box.cell_angles_deg_np()
        h = self.box.h_np()
        return {"step": step, "temp": T, "pe": float(E), "ke": ke,
                "etotal": float(E) + ke, "press": press, "vol": vol,
                "cellalpha": float(alpha), "cellbeta": float(beta),
                "cellgamma": float(gamma),
                "pxx": float(ptens[0, 0]), "pyy": float(ptens[1, 1]),
                "pzz": float(ptens[2, 2]),
                "pxy": 0.5 * float(ptens[0, 1] + ptens[1, 0]),
                "pxz": 0.5 * float(ptens[0, 2] + ptens[2, 0]),
                "pyz": 0.5 * float(ptens[1, 2] + ptens[2, 1]),
                "lx": float(h[0, 0]), "ly": float(h[1, 1]),
                "lz": float(h[2, 2])}

    # -- main loop ---------------------------------------------------------
    def _segment(self, seg: int):
        if self._seg_jit is None:
            self._seg_jit = {}
        if seg not in self._seg_jit:
            self._seg_jit[seg] = self._build_segment(seg)
        return self._seg_jit[seg](self.shards, self.halo, self.nbr)

    # -- fused multi-segment device loop ------------------------------------
    def _build_loop(self):
        """Segments AND resettles (migration + halo + per-shard rebuild)
        under one lax.while_loop — the sharded analogue of
        Engine._device_loop_fn.  One host sync per span instead of one
        per segment; the reference's MPI version syncs every STEP
        (forward/reverse comm), so this is the piece of the design that
        converts halo latency into pipeline depth.

        The while-loop condition and the resettle predicate are
        replicated scalars (pmax-reduced), so every device runs the same
        control flow and collective sequence (SPMD-safe).  Overflow and
        lost-atom flags are max-merged across in-loop resettles and
        checked once per span by the host (detection of a lost atom is
        delayed to the span end; the span is then discarded, exactly as
        for overflow)."""
        if self._resettle_jit is None:
            self._resettle_jit = self._build_resettle()
        check = self.check_every
        if check not in (self._seg_jit or {}):
            self._seg_jit = self._seg_jit or {}
            self._seg_jit[check] = self._build_segment(check)
        resettle = self._resettle_jit
        segment = self._seg_jit[check]
        half2 = jnp.asarray((0.5 * self.skin) ** 2, self.dtype)

        def loop(ss, halo, nbr, pending0, nsteps):
            zero_flags = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(resettle, ss)[3])
            halfd = jnp.sqrt(half2)

            def body(carry):
                ss, halo, nbr, done, pending, flags, dprev, n_rs = carry

                def do_rs(s, hl, nb, fl):
                    s2, hl2, nb2, fl2 = resettle(s)
                    fl = jax.tree_util.tree_map(jnp.maximum, fl, fl2)
                    return s2, hl2, nb2, fl

                ss, halo, nbr, flags = jax.lax.cond(
                    pending, do_rs, lambda s, hl, nb, fl: (s, hl, nb, fl),
                    ss, halo, nbr, flags)
                n_rs = n_rs + pending.astype(jnp.int32)
                ns, maxd = segment(ss, halo, nbr)
                tripped = maxd > half2
                accept = jnp.logical_or(pending, jnp.logical_not(tripped))
                ss = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(accept, a, b), ns, ss)
                done = done + jnp.where(accept, check, 0)
                # predictive proactive resettle (see Engine._device_loop_fn:
                # extrapolate one segment of displacement growth so hot
                # systems resettle BEFORE the half-skin trips instead of
                # discarding and re-running nearly every segment)
                d = jnp.sqrt(maxd)
                growth = jnp.maximum(d - dprev, 0.0)
                pending = (d + growth > 0.95 * halfd) | tripped
                return ss, halo, nbr, done, pending, flags, d, n_rs

            carry = (ss, halo, nbr, jnp.zeros((), jnp.int32), pending0,
                     zero_flags, jnp.zeros((), self.dtype),
                     jnp.zeros((), jnp.int32))
            ss, halo, nbr, done, pending, flags, _, n_rs = jax.lax.while_loop(
                lambda c: c[3] < nsteps, body, carry)
            return ss, halo, nbr, pending, flags, n_rs

        return jax.jit(loop, static_argnums=4)

    def _run_span_device(self, nsteps: int, _retry: int = 0):
        """Advance `nsteps` (a multiple of check_every) in one dispatch."""
        if self._loop_jit is None:
            self._loop_jit = self._build_loop()
        start = (self.shards, self.halo, self.nbr)
        pending0 = getattr(self, "_pending_rebuild", False)
        ss, halo, nbr, pending, flags, n_rs = self._loop_jit(
            self.shards, self.halo, self.nbr, jnp.asarray(pending0), nsteps)
        flags_np = jax.device_get(flags)
        resettled = bool(flags_np.get("count:slab", 0))
        if resettled and int(flags_np["lost_atoms"]):
            raise RuntimeError(
                f"{int(flags_np['lost_atoms'])} atoms moved more than one "
                f"slab between reneighbor events — check_every too large")
        bad = [k for k, v in flags_np.items()
               if ("overflow" in k) and bool(v)]
        if bad:
            if _retry >= 5:
                raise RuntimeError(f"sharded rebuild overflow persists: "
                                   f"{flags_np}")
            # a truncated in-loop rebuild stepped physics: discard the
            # span, re-size, resettle, and re-run it
            self.shards, self.halo, self.nbr = start
            self._grow(flags_np, bad)
            self._loop_jit = None
            self.resettle()
            return self._run_span_device(nsteps, _retry + 1)
        self.shards, self.halo, self.nbr = ss, halo, nbr
        self._pending_rebuild = pending
        self._f_valid = True
        # Neigh attribution for in-loop resettles (the caller books the
        # span under Pair): scale by the measured warm resettle cost
        n_rs_i = int(jax.device_get(n_rs))
        cost = getattr(self, "_resettle_cost", None)
        if n_rs_i > 0 and cost is not None:
            self.timers.transfer("Pair", "Neigh", n_rs_i * cost)

    def run(self, nsteps: int, thermo_every: int = 0,
            on_thermo=None, callbacks=()):
        """Run `nsteps`; same contract as Engine.run.  `callbacks`
        ((every, fn) pairs, e.g. dump writers) receive the GATHERED global
        State — the sharded analogue of LAMMPS ranks funnelling dump data
        to the writing proc."""
        self._setup_forces()
        self.timers.start_run(self.natoms, chips=self.n_devices)
        rows = []

        def emit():
            with self.timers.section("Output"):
                row = self.thermo()
            rows.append(row)
            if on_thermo:
                on_thermo(row)

        def fire_callbacks():
            st = None
            for every, fn in callbacks:
                if done % every == 0:
                    if st is None:
                        with self.timers.section("Output"):
                            st = self.to_state()
                    fn(st)

        done = 0
        if thermo_every:
            emit()
        for every, fn in callbacks:
            fn(self.to_state())
        half_skin_sq = (0.5 * self.skin) ** 2
        while done < nsteps:
            span = nsteps - done
            if thermo_every:
                span = min(span, thermo_every - (done % thermo_every))
            for every, _ in callbacks:
                span = min(span, every - (done % every))

            fused = getattr(self, "fused_loop", None)
            if fused is None:
                fused = jax.default_backend() not in ("cpu",)
            if fused and span >= self.check_every:
                m = (span // self.check_every) * self.check_every
                m = min(m, 16 * self.check_every)
                try:
                    with self.timers.section("Pair"):
                        self._run_span_device(m)
                except Exception as e:
                    import warnings
                    warnings.warn(f"fused sharded loop failed ({e!r}); "
                                  "falling back to the per-segment loop")
                    self.fused_loop = False
                    continue
                self._note_comm(m)
                done += m
                if thermo_every and done % thermo_every == 0:
                    emit()
                fire_callbacks()
                continue

            seg = min(self.check_every, span)
            start = self.shards
            with self.timers.section("Pair"):
                new_ss, maxd = self._segment(seg)
            if float(maxd) > half_skin_sq:
                # redo the segment from the checkpoint with fresh lists
                # (bitwise equivalent to per-step checking; list slack
                # does not change physics)
                self.shards = start
                with self.timers.section("Neigh"):
                    self.resettle()
                with self.timers.section("Pair"):
                    new_ss, maxd = self._segment(seg)
                self.shards = new_ss
                if float(maxd) > half_skin_sq:
                    with self.timers.section("Neigh"):
                        self.resettle()
            else:
                self.shards = new_ss
            self._note_comm(seg)
            done += seg
            if thermo_every and done % thermo_every == 0:
                emit()
            fire_callbacks()
        self.timers.end_run(nsteps)
        self.thermo_rows = rows
        return rows

    def fix_view_state(self):
        """State-shaped view carrying the (replicated) fix extras for
        fix-output reads (compute_scalar/vector, fix_bfield.cpp:542-562).
        Reductions inside the sharded step already psum'd these, so row 0
        of each [Pn, ...] leaf IS the global value."""
        import types
        extras = jax.tree_util.tree_map(lambda a: a[0], self.shards.extras)
        return types.SimpleNamespace(extras=extras)

    # -- gather back -------------------------------------------------------
    def to_state(self) -> State:
        """Reassemble a global State (ordered by original atom id)."""
        ss = jax.device_get(self.shards)
        valid = np.asarray(ss.valid).reshape(-1)
        tag = np.asarray(ss.tag).reshape(-1)[valid]
        order = np.argsort(tag)

        def unpack(a):
            flat = np.asarray(a).reshape((-1,) + a.shape[2:])[valid]
            return flat[order]

        return State(
            x=jnp.asarray(unpack(ss.x), self.dtype),
            v=jnp.asarray(unpack(ss.v), self.dtype),
            f=jnp.asarray(unpack(ss.f), self.dtype),
            type=jnp.asarray(unpack(ss.type), jnp.int32),
            q=jnp.asarray(unpack(ss.q), self.dtype),
            image=jnp.asarray(unpack(ss.image), jnp.int32),
            mass=self._mass, box=self.box,
            step=jnp.asarray(int(np.asarray(ss.step)[0]), jnp.int32),
            extras={})
