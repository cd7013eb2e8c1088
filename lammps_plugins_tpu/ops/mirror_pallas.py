"""Pallas TPU kernel: mirror-combine consumer for the REBO force path.

The scatter-free REBO accumulation (neighbor/neighbor.py mirror_combine,
the TPU answer to newton-on reverse communication, pair_aeam.cpp:257) is

    F_i = sum_k G[i, k] - sum_k G[mirror(i, k)]

The second term's gather CAN run in the fast row class (~1.3 ns/row) when
its output is consumed elementwise — but any XLA K-reduction consumer
re-fuses the gather and flips both the table and the output into
component-plane layouts, splitting it into three ~2.8 ms element gathers
(probe_mirror9-13: every reduce-terminated form ~10-12 ms at the 98k
bench shape, every elementwise-terminated form ~1.8-2.6 ms; an
optimization_barrier does NOT stop the layout propagation).

This kernel is the reduction consumer XLA cannot fuse into: the gather's
only consumer is an opaque pallas_call, so XLA keeps the interleaved
[K, Np, 4] row-gather output (the fast class), and the K-reduction runs
here as trivial VMEM arithmetic.  Inputs are the REBO kernel's cotangent
planes gx/gy/gz (for the A-side row sum) plus the gathered mirror rows
and the mirror-validity plane; output is the per-atom force in [8, Np]
rows (x, y, z, 0...).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import out_struct


def _make_rowfetch_kernel(K: int, NB: int, Wr: int):
    """Row-fetch mirror combine consumer.

    rows2[k, i, :] is the gathered WHOLE cotangent row of the mirror
    atom j(k, i) from the atom-major [Np, Wr] table
    (Grow[j] = [Gx[0:K, j] | Gy | Gz | pad]); the kernel selects the
    reverse-edge slot l(k, i) per component by lane mask and reduces —
    the K-consumer XLA would otherwise re-fuse into the slow
    component-plane gather form (see mirror_combine_rows)."""
    def kernel(gx_ref, gy_ref, gz_ref, r2_ref, ls_ref, mv_ref, out_ref):
        gx = gx_ref[...]                     # [K, NB]
        gy = gy_ref[...]
        gz = gz_ref[...]
        mv = mv_ref[...]                     # [K, NB] validity (0/1)
        ls = ls_ref[...]                     # [K, NB] mirror slot (f32)
        r2 = r2_ref[...]                     # [K, NB, Wr]
        # Full-width masked reduces: 3 x (cmp + select + sum over Wr).
        # A single mod-K compare + three static 20-lane window reduces
        # was tried and measured SLOWER in situ (3.83 vs 3.97e6 best at
        # 98k atoms): unaligned lane-window slices cost Mosaic more than
        # the extra full-width compares save.
        li = jax.lax.broadcasted_iota(jnp.int32, (K, NB, Wr), 2) \
            .astype(gx.dtype)
        d = li - ls[:, :, None]
        zero = jnp.zeros_like(r2)
        gmx = jnp.sum(jnp.where(d == 0.0, r2, zero), axis=2)
        gmy = jnp.sum(jnp.where(d == float(K), r2, zero), axis=2)
        gmz = jnp.sum(jnp.where(d == float(2 * K), r2, zero), axis=2)
        fx = jnp.sum(gx - gmx * mv, axis=0, keepdims=True)
        fy = jnp.sum(gy - gmy * mv, axis=0, keepdims=True)
        fz = jnp.sum(gz - gmz * mv, axis=0, keepdims=True)
        z = jnp.zeros_like(fx)
        out_ref[...] = jnp.concatenate([fx, fy, fz, z, z, z, z, z], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def mirror_combine_rowfetch(gx, gy, gz, rows2, lslot, mirv, *,
                            interpret: bool = False):
    """F rows [8, Np] from gathered mirror ROWS (the row-fetch combine).

    Args:
      gx, gy, gz: [K, Np] cotangent planes (REBO kernel outputs).
      rows2: [K, Np, Wr] gathered mirror rows (row gather of the pinned
        atom-major [Np, Wr] cotangent table by the mirror atom column).
      lslot: [K, Np] reverse-edge slot as float.
      mirv: [K, Np] mirror-validity plane (float 0/1).
    """
    K, Np = gx.shape
    Wr = rows2.shape[2]
    NB = 128
    blk = pl.BlockSpec((K, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    blkw = pl.BlockSpec((K, NB, Wr), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    blk8 = pl.BlockSpec((8, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_rowfetch_kernel(K, NB, Wr),
        grid=(Np // NB,),
        in_specs=[blk, blk, blk, blkw, blk, blk],
        out_specs=blk8,
        out_shape=out_struct((8, Np), gx.dtype, gx),
        cost_estimate=pl.CostEstimate(
            flops=Np * K * (Wr * 7 + 9), bytes_accessed=Np * K * Wr * 4,
            transcendentals=0),
        interpret=interpret,
    )(gx, gy, gz, rows2, lslot, mirv)


def _make_kernel(K: int, NB: int):
    def kernel(gx_ref, gy_ref, gz_ref, gm_ref, mv_ref, out_ref):
        gx = gx_ref[...]                     # [K, NB]
        gy = gy_ref[...]
        gz = gz_ref[...]
        mv = mv_ref[...]                     # [K, NB] validity (0/1)
        fx = jnp.sum(gx - gm_ref[:, :, 0] * mv, axis=0, keepdims=True)
        fy = jnp.sum(gy - gm_ref[:, :, 1] * mv, axis=0, keepdims=True)
        fz = jnp.sum(gz - gm_ref[:, :, 2] * mv, axis=0, keepdims=True)
        z = jnp.zeros_like(fx)
        out_ref[...] = jnp.concatenate([fx, fy, fz, z, z, z, z, z], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def mirror_combine_rows(gx, gy, gz, gmir4, mirv, *, interpret: bool = False):
    """F rows [8, Np] = sum_k G - sum_k gmir (components on rows 0-2).

    Args:
      gx, gy, gz: [K, Np] cotangent planes (REBO kernel outputs).
      gmir4: [K, Np, 4] mirror rows (row gather of the kernel's
        interleaved [K*Np, 4] cotangent table by the rebuild-time mirror
        slot table; component 3 is padding).
      mirv: [K, Np] mirror-validity plane (float 0/1).
    """
    K, Np = gx.shape
    NB = 128
    blk = pl.BlockSpec((K, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    blk4 = pl.BlockSpec((K, NB, 4), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    blk8 = pl.BlockSpec((8, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(K, NB),
        grid=(Np // NB,),
        in_specs=[blk, blk, blk, blk4, blk],
        out_specs=blk8,
        out_shape=out_struct((8, Np), gx.dtype, gx),
        cost_estimate=pl.CostEstimate(
            flops=Np * K * 9, bytes_accessed=Np * K * 9 * 4,
            transcendentals=0),
        interpret=interpret,
    )(gx, gy, gz, gmir4, mirv)
