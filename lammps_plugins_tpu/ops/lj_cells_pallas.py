"""Pallas TPU kernel: switched-LJ forces over the dense cell decomposition.

This is the hot-path replacement for the XLA cell-form LJ sweep in
potentials/rebomos.py (`_lj_forces_cells`).  Same physics — the three-regime
switched Lennard-Jones of the reference (pair_rebomos.cpp:518-543) — but
restructured for the TPU memory system:

  * One fused kernel: no [ncells, C, C] intermediates ever reach HBM (the
    XLA sweep spilled ~30 such tensors per offset, ~95 ms/step at 98k atoms).
  * Full 27-offset, A-side-only enumeration: every ordered pair (a, b) is
    evaluated once from a's side, so each OWNED atom's force is complete from
    its own cell row and the two scatter-adds of the half-offset form
    (B-side cell scatter + ghost-to-owner reverse scatter) vanish.  Pairs are
    evaluated twice in total (once per side) — cheaper than scattering.
  * Pair blocks [C, C] are pure VPU arithmetic (an MXU augmented-matmul
    rsq variant was tried and measured SLOWER — f32 HIGHEST dots cost 6
    bf16 passes per block — and lower-precision dots corrupt forces).
  * Per-pair-type constants (sigma/epsilon-derived) enter as bilinear
    functions of the element codes (exact for codes in {0, 1}) — one FMA per
    constant per pair instead of gather or select chains.

Grid: one program per (A cell column x, y, (dx, dy) in 3x3); each program
walks the z pencil and its dz in {-1, 0, 1} neighbors — cells are sized so
the interaction cutoff never spans more than one cell.  The cell grid is
built with a one-cell halo ring of empty cells (neighbor/device_build.py),
making neighbor-block indexing purely affine: no boundary logic in-kernel.

Self-pairs and padding need no masks: padded slots are parked at 1e7 (rsq
~1e14 -> outside the LJ window -> exact 0), and a self-pair has rsq = 0
inside rcLJmin where the reference potential is identically zero.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import out_struct


def derive_lj_constants(tables) -> dict:
    """Per-element-pair scalars for the switched LJ, as bilinear coeffs.

    For constant P with corner values P[ea][eb] (element codes 0/1), the
    kernel evaluates P = pa(ea) + pbc(ea) * eb with
        pa(ea)  = P00 + ea * (P10 - P00)
        pbc(ea) = (P01 - P00) + ea * (P11 - P10 - P01 + P00)
    exact at all four corners.  Returns name -> (a0, a1, b0, b1) floats.

    Constants (reference formulas, pair_rebomos.cpp:262-265, 532-543):
      lj1 = 48 eps sig^12, lj2 = 24 eps sig^6 (force prefactors)
      lj3 = 4 eps sig^12,  lj4 = 4 eps sig^6  (energy prefactors)
      ljminsq/ljmaxsq/s95sq: squared regime boundaries
      ljmin: rcLJmin (for the ramp's dr)
      k2 = -2 c2, k3 = -3 c3 (ramp force), c2, c3 (ramp energy)
    """
    t = tables
    vals = {}
    for name in ("lj1", "lj2", "lj3", "lj4", "ljminsq", "ljmaxsq",
                 "s95sq", "ljmin", "k2", "k3", "c2", "c3"):
        vals[name] = np.zeros((2, 2))
    for ea in range(2):
        for eb in range(2):
            sig = float(t.sigma[ea, eb])
            eps = float(t.epsilon[ea, eb])
            ljmin = float(t.rcLJmin[ea, eb])
            ljmax = float(t.rcLJmax[ea, eb])
            drw = 0.95 * sig - ljmin
            r6c = (1.0 / 0.95) ** 6
            vdw = 4.0 * eps * r6c * (r6c - 1.0)
            dvdw = (-4.0 * eps / (0.95 * sig)) * r6c * (12.0 * r6c - 6.0)
            c2 = ((3.0 / drw) * vdw - dvdw) / drw
            c3 = (vdw / (drw * drw) - c2) / drw
            vals["lj1"][ea, eb] = float(t.lj1[ea, eb])
            vals["lj2"][ea, eb] = float(t.lj2[ea, eb])
            vals["lj3"][ea, eb] = float(t.lj3[ea, eb])
            vals["lj4"][ea, eb] = float(t.lj4[ea, eb])
            vals["ljminsq"][ea, eb] = ljmin * ljmin
            vals["ljmaxsq"][ea, eb] = ljmax * ljmax
            vals["s95sq"][ea, eb] = (0.95 * sig) ** 2
            vals["ljmin"][ea, eb] = ljmin
            vals["k2"][ea, eb] = -2.0 * c2
            vals["k3"][ea, eb] = -3.0 * c3
            vals["c2"][ea, eb] = c2
            vals["c3"][ea, eb] = c3
    out = {}
    for name, P in vals.items():
        out[name] = (float(P[0, 0]), float(P[1, 0] - P[0, 0]),
                     float(P[0, 1] - P[0, 0]),
                     float(P[1, 1] - P[1, 0] - P[0, 1] + P[0, 0]))
    return out


def _bilinear_row(coef, ael):
    """(pa, pbc) rows [1, C] from the A-element row (bilinear setup)."""
    a0, a1, b0, b1 = coef
    return a0 + ael * a1, b0 + ael * b1


def _make_kernel(consts: dict, a_range, cell_mn, cell_size, Dz: int,
                 with_energy: bool):
    del cell_mn, cell_size                  # geometry only sizes the grid
    (x0, _), (y0, _), (z0, z1) = a_range
    Az = z1 - z0

    def kernel(a_ref, b_ref, f_ref, bT_ref):
        q = pl.program_id(2)

        @pl.when(q == 0)
        def _():
            f_ref[...] = jnp.zeros_like(f_ref)

        # B element codes transposed once per program: [C, Dz]
        elT = jnp.swapaxes(b_ref[0, 0, :, 3, :], 0, 1)

        # Pre-transpose the B pencil's coordinate rows into scratch once
        # per program: the pair block wants B on sublanes ([C, 1]
        # columns), and transposing inside the (t, dz) loops costs 3x
        # more relayouts (each z-cell is consumed by three A cells).
        zlo, zhi = max(z0 - 1, 0), min(z1 + 1, Dz)
        for zb in range(zlo, zhi):
            bT_ref[zb, :, 0:4] = jnp.swapaxes(b_ref[0, 0, zb, 0:4, :], 0, 1)

        for t in range(Az):
            a = a_ref[0, 0, z0 + t]                      # [8, C]
            ax, ay, az = a[0:1], a[1:2], a[2:3]
            ael = a[3:4]

            # per-A-row bilinear constant setup (rows [1, C])
            row = {k: _bilinear_row(consts[k], ael) for k in consts}

            fxa = jnp.zeros_like(ax)
            fya = jnp.zeros_like(ax)
            fza = jnp.zeros_like(ax)
            eacc = jnp.zeros_like(ax) if with_energy else None
            for dz in (-1, 0, 1):
                zb = z0 + t + dz
                # pair block [C(b) sublanes, C(a) lanes], pure VPU — the
                # MXU (augmented-matmul) form was measured slower: the
                # f32 HIGHEST dot is 6 bf16 passes per block
                dxm = ax - bT_ref[zb, :, 0:1]
                dym = ay - bT_ref[zb, :, 1:2]
                dzm = az - bT_ref[zb, :, 2:3]
                rsq = dxm * dxm + dym * dym + dzm * dzm
                ebc = elT[:, zb:zb + 1]                  # [C, 1]

                def cst(name):
                    pa, pbc = row[name]
                    return pa + pbc * ebc                # [C, C]

                rinv = jax.lax.rsqrt(rsq)
                r = rsq * rinv
                r2inv = rinv * rinv
                r6inv = r2inv * r2inv * r2inv
                f126 = (cst("lj1") * r6inv - cst("lj2")) * r6inv * r2inv
                drp = r - cst("ljmin")
                framp = drp * (cst("k3") * drp + cst("k2")) * rinv
                fp = jnp.where(rsq >= cst("s95sq"), f126, framp)
                outside = (rsq > cst("ljmaxsq")) | (rsq < cst("ljminsq"))
                fp = jnp.where(outside, jnp.zeros_like(fp), fp)

                # F_a = sum_b fp * (x_a - x_b), reduced over sublanes
                fxa = fxa + jnp.sum(fp * dxm, axis=0, keepdims=True)
                fya = fya + jnp.sum(fp * dym, axis=0, keepdims=True)
                fza = fza + jnp.sum(fp * dzm, axis=0, keepdims=True)
                if with_energy:
                    v126 = (cst("lj3") * r6inv - cst("lj4")) * r6inv
                    vramp = drp * drp * (cst("c3") * drp + cst("c2"))
                    vlj = jnp.where(rsq >= cst("s95sq"), v126, vramp)
                    vlj = jnp.where(outside, jnp.zeros_like(vlj), vlj)
                    eacc = eacc + jnp.sum(vlj, axis=0, keepdims=True)

            facc = jnp.concatenate([fxa, fya, fza], axis=0)
            upd = f_ref[0, 0, t, 0:3] + facc
            f_ref[0, 0, t, 0:3] = upd
            if with_energy:
                aown = a[4:5]
                f_ref[0, 0, t, 3:4] = (f_ref[0, 0, t, 3:4]
                                       + 0.5 * aown * eacc)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "a_range", "cell_mn", "cell_size", "consts_key", "with_energy",
    "interpret"))
def _lj_cell_call(P, *, a_range, cell_mn, cell_size, consts_key,
                  with_energy, interpret):
    consts = dict(consts_key)
    Dx, Dy, Dz, R, C = P.shape
    (x0, x1), (y0, y1), (z0, z1) = a_range
    Ax, Ay, Az = x1 - x0, y1 - y0, z1 - z0
    kernel = _make_kernel(consts, a_range, cell_mn, cell_size, Dz,
                          with_energy)
    blk = (1, 1, Dz, R, C)
    grid = (Ax, Ay, 9)
    pairs = Ax * Ay * 9 * Az * 3 * C * C
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk, lambda i, j, q: (x0 + i, y0 + j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda i, j, q: (x0 + i + q // 3 - 1,
                                               y0 + j + q % 3 - 1, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Az, R, C),
                               lambda i, j, q: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((Ax, Ay, Az, R, C), P.dtype, P),
        scratch_shapes=[pltpu.VMEM((Dz, C, 8), P.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=pairs * 30, bytes_accessed=pairs // (C * C) * Dz * R * C * 8,
            transcendentals=pairs),
        interpret=interpret,
    )(P, P)
    return out


def _make_half_kernel(consts: dict, t_range, Dz: int, dzs, self_call: bool):
    """Newton-half variant: one unordered cell pair per block.

    Per program (one A pencil vs one B pencil at a fixed (dx, dy) column
    offset), every evaluated [C, C] pair block contributes BOTH the A-side
    row forces (reduce over sublanes) and the negated B-side forces
    (reduce over lanes, accumulated in transposed [C, 8] layout so the
    lane reduction lands on sublanes with no in-kernel transpose).  The
    self-column call handles dz in {0, +1}: the dz=0 in-cell block is
    evaluated A-side-complete (both directed slots present), so it takes
    no B write; dz=-1 pairs are covered by the cell below's dz=+1.

    Out-of-range zb (clamped) duplicates only ever land in halo cells
    whose force rows are discarded by the atom remap, because the A range
    is extended exactly one halo ring on the sides a legitimate pair
    could straddle (see lj_cell_forces_half).
    """
    t0, t1 = t_range

    def kernel(a_ref, b_ref, fa_ref, fb_ref):
        fa_ref[...] = jnp.zeros_like(fa_ref)
        fb_ref[...] = jnp.zeros_like(fb_ref)
        elT = jnp.swapaxes(b_ref[0, 0, :, 3, :], 0, 1)   # [C, Dz]

        for t in range(t0, t1):
            a = a_ref[0, 0, t]                           # [8, C]
            ax, ay, az = a[0:1], a[1:2], a[2:3]
            ael = a[3:4]
            zero = jnp.zeros_like(ax)
            row = {k: _bilinear_row(consts[k], ael) for k in consts}
            facc = jnp.zeros_like(a)
            for dz in dzs:
                zb = min(max(t + dz, 0), Dz - 1)
                b = b_ref[0, 0, zb]
                dxm = ax - jnp.swapaxes(b[0:1], 0, 1)
                dym = ay - jnp.swapaxes(b[1:2], 0, 1)
                dzm = az - jnp.swapaxes(b[2:3], 0, 1)
                rsq = dxm * dxm + dym * dym + dzm * dzm
                ebc = elT[:, zb:zb + 1]                  # [C, 1]

                def cst(name):
                    pa, pbc = row[name]
                    return pa + pbc * ebc                # [C, C]

                rinv = jax.lax.rsqrt(rsq)
                r = rsq * rinv
                r2inv = rinv * rinv
                r6inv = r2inv * r2inv * r2inv
                f126 = (cst("lj1") * r6inv - cst("lj2")) * r6inv * r2inv
                drp = r - cst("ljmin")
                framp = drp * (cst("k3") * drp + cst("k2")) * rinv
                fp = jnp.where(rsq >= cst("s95sq"), f126, framp)
                outside = (rsq > cst("ljmaxsq")) | (rsq < cst("ljminsq"))
                fp = jnp.where(outside, jnp.zeros_like(fp), fp)

                fxp = fp * dxm
                fyp = fp * dym
                fzp = fp * dzm
                fxr = jnp.sum(fxp, axis=0, keepdims=True)
                fyr = jnp.sum(fyp, axis=0, keepdims=True)
                fzr = jnp.sum(fzp, axis=0, keepdims=True)
                facc = facc + jnp.concatenate(
                    [fxr, fyr, fzr, zero, zero, zero, zero, zero], axis=0)
                if not (self_call and dz == 0):
                    # B-side: F_b -= sum_a fp * (x_a - x_b), lane reduce
                    fb_ref[0, 0, zb, :, 0:1] = fb_ref[0, 0, zb, :, 0:1] \
                        - jnp.sum(fxp, axis=1, keepdims=True)
                    fb_ref[0, 0, zb, :, 1:2] = fb_ref[0, 0, zb, :, 1:2] \
                        - jnp.sum(fyp, axis=1, keepdims=True)
                    fb_ref[0, 0, zb, :, 2:3] = fb_ref[0, 0, zb, :, 2:3] \
                        - jnp.sum(fzp, axis=1, keepdims=True)
            upd = fa_ref[0, 0, t, 0:3] + facc[0:3]
            fa_ref[0, 0, t, 0:3] = upd

    return kernel


#: lexicographically-positive (dx, dy) column offsets: with the self
#: column they cover every unordered 9-neighborhood column pair once.
_HALF_OFFSETS = ((0, 0), (1, 0), (0, 1), (1, 1), (1, -1))


@functools.partial(jax.jit, static_argnames=(
    "a_range", "consts_key", "interpret"))
def _lj_half_call(P, *, a_range, consts_key, interpret):
    consts = dict(consts_key)
    Dx, Dy, Dz, R, C = P.shape
    (x0, x1), (y0, y1), (z0, z1) = a_range
    fa_total = None
    fb_total = None
    for (dx, dy) in _HALF_OFFSETS:
        self_call = (dx, dy) == (0, 0)
        # A-range extension: one halo ring on each side a legit
        # owned-involving pair could straddle for this offset
        ax0 = x0 - (1 if dx > 0 else 0)
        ay0 = y0 - (1 if dy > 0 else 0)
        ay1 = y1 + (1 if dy < 0 else 0)
        if self_call:
            t_range, dzs = (z0 - 1, z1), (0, 1)
        else:
            t_range, dzs = (z0 - 1, z1 + 1), (-1, 0, 1)
        AxE, AyE = x1 - ax0, ay1 - ay0
        kernel = _make_half_kernel(consts, t_range, Dz, dzs, self_call)
        blk = (1, 1, Dz, R, C)
        fa, fb = pl.pallas_call(
            kernel,
            grid=(AxE, AyE),
            in_specs=[
                pl.BlockSpec(blk, lambda i, j: (ax0 + i, ay0 + j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(blk,
                             lambda i, j, dx=dx, dy=dy:
                             (ax0 + i + dx, ay0 + j + dy, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, Dz, R, C), lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Dz, C, 8), lambda i, j: (i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(out_struct((AxE, AyE, Dz, R, C), P.dtype, P),
                       out_struct((AxE, AyE, Dz, C, 8), P.dtype, P)),
            cost_estimate=pl.CostEstimate(
                flops=AxE * AyE * Dz * len(dzs) * C * C * 33,
                bytes_accessed=AxE * AyE * Dz * R * C * 16,
                transcendentals=AxE * AyE * Dz * len(dzs) * C * C),
            interpret=interpret,
        )(P, P)
        # place compact per-call grids into full-grid accumulators
        if fa_total is None:
            fa_total = jnp.zeros((Dx, Dy, Dz, R, C), P.dtype)
            fb_total = jnp.zeros((Dx, Dy, Dz, C, 8), P.dtype)
        fa_total = fa_total.at[ax0:ax0 + AxE, ay0:ay0 + AyE].add(fa)
        fb_total = fb_total.at[ax0 + dx:ax0 + dx + AxE,
                               ay0 + dy:ay0 + dy + AyE].add(fb)
    # combined per-slot forces on the owned range, [Ax, Ay, Az, C, 3]
    FA = fa_total[x0:x1, y0:y1, z0:z1]
    FB = fb_total[x0:x1, y0:y1, z0:z1]
    return FA[..., 0:3, :].transpose(0, 1, 2, 4, 3) + FB[..., :, 0:3]


def lj_cell_forces_half(P: jnp.ndarray, consts: dict,
                        a_range: Tuple[Tuple[int, int], ...],
                        interpret: bool = False):
    """Newton-half cell-pair LJ forces.

    Same physics and inputs as lj_cell_forces, but every unordered cell
    pair is evaluated once (5 calls over the half-offset column set)
    instead of every ordered pair from the A side (27 offsets) — the TPU
    answer to the reference's newton-on pair halving
    (pair_rebomos.cpp:394-402), with the reverse-force scatter replaced
    by in-kernel transposed-layout accumulation.

    Returns [Ax, Ay, Az, C, 3] per-slot forces over the a_range cells
    (already combined A-side + B-side, ready for the atom remap).
    """
    consts_key = tuple(sorted(consts.items()))
    return _lj_half_call(P, a_range=tuple(a_range), consts_key=consts_key,
                         interpret=interpret)


def lj_cell_forces(P: jnp.ndarray, consts: dict,
                   a_range: Tuple[Tuple[int, int], ...],
                   cell_mn: Tuple[float, float, float], cell_size: float,
                   with_energy: bool = False, interpret: bool = False):
    """Run the kernel.

    Args:
      P: [Dx, Dy, Dz, 8, C] packed cell planes — rows 0-2 x/y/z (padding
        slots parked at ~1e7), row 3 element code (0/1), row 4 owned flag.
      consts: from derive_lj_constants().
      a_range: static per-dim (start, stop) cell ranges covering every cell
        that can hold an owned atom (RebuildPlan.a_range).
      cell_mn / cell_size: cell-grid origin and edge (for re-centering).

    Returns [Ax, Ay, Az, 8, C]: rows 0-2 = force on the A-slot atom; row 3 =
    per-slot owned energy when with_energy (0.5 * owned * sum_b vlj).
    """
    consts_key = tuple(sorted(consts.items()))
    return _lj_cell_call(P, a_range=a_range, cell_mn=tuple(cell_mn),
                         cell_size=float(cell_size), consts_key=consts_key,
                         with_energy=with_energy, interpret=interpret)
