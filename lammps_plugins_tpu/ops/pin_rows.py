"""Layout anchor: force an array through a row-major Pallas identity copy.

XLA's layout assignment materializes a stack of per-component planes
([K, Np] x 3 -> [M, 3]) in the column-major {0,1:T(4,128)} layout, because
that layout makes the stack itself free.  But a downstream row gather from
a column-major table runs as three element-gather streams (~1.7 ns/elem at
98k atoms, profiled), while the same gather from a row-major
{1,0:T(8,128)} table runs 4x faster (~0.43 ns/elem — the production
D-gather's measured rate).  A Pallas custom call pins its operand and
result layouts to the dense row-major form, so inserting a no-op identity
copy between the producer and the gather forces XLA to do the interleave
with its transpose-copy emitter once (~1.3 ms for 23.5 MB, profiled as
copy.479) instead of paying the slow-gather tax every consumer.

The copy itself moves blocks VMEM<->HBM at full DMA rate (~0.1 ms for
23.5 MB); the cost of the pin is the upstream relayout it forces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ident_kernel(i_ref, o_ref):
    o_ref[...] = i_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pin_call(flat2d, *, interpret):
    R, L = flat2d.shape
    # one program per row-block: pure streaming copy
    blk_r = min(R, 4096)
    grid = (-(-R // blk_r),)
    return pl.pallas_call(
        _ident_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((blk_r, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk_r, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, L), flat2d.dtype),
        interpret=interpret,
    )(flat2d)


def pin_rows3(planes_stacked: jnp.ndarray, interpret: bool = False):
    """[..., 3] interleaved table, pinned to the dense row-major layout.

    Args:
      planes_stacked: [A, B, 3] (e.g. jnp.stack([gx, gy, gz], axis=-1)).
    Returns:
      [A*B, 3] with the flat interleaved element order guaranteed
      materialized (x0 y0 z0 x1 ...), produced through the identity
      custom call so the downstream gather sees a row-major operand.
    """
    M = planes_stacked.shape[0] * planes_stacked.shape[1]
    flat = planes_stacked.reshape(-1)           # forces the interleave
    # pad to a 128-lane 2-D shape for clean Mosaic tiling
    L = 128
    R = -(-flat.shape[0] // L)
    pad = R * L - flat.shape[0]
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    out = _pin_call(flat.reshape(R, L), interpret=interpret)
    return out.reshape(-1)[: M * 3].reshape(M, 3)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pin2_call(a2d, *, interpret):
    K, W = a2d.shape
    # Mosaic wants the block's trailing dims 128-divisible (or full);
    # the first dim rides full (K is small).  Pick the largest
    # 128-aligned column divisor that keeps the block under ~1 MB.
    bw = W
    ntile = W // 128
    for t in range(ntile, 0, -1):
        if ntile % t == 0 and K * t * 128 * 4 <= (1 << 20):
            bw = t * 128
            break
    return pl.pallas_call(
        _ident_kernel,
        grid=(W // bw,),
        in_specs=[pl.BlockSpec((K, bw), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K, bw), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, W), a2d.dtype),
        interpret=interpret,
    )(a2d)


def pin_rows3_v2(planes_stacked: jnp.ndarray, interpret: bool = False):
    """[K, Np, 3] -> [K*Np, 3] row-major table via a 2-D layout pin.

    pin_rows3 forced the interleave through a padded 1-D flatten, which
    cost more in relayout copies than the fast row gather saved in situ
    (2.54e6 vs 3.07e6 at-st/s at 98k atoms).  Here the [K, Np, 3] stack
    is reshaped to [K, Np*3] — whose required custom-call operand layout
    ({1,0} dense) has the SAME memory order as the interleaved row-major
    table — so XLA realizes the interleave with one transpose-copy
    (~1.3 ms for 23.5 MB at 98k atoms, its standard emitter rate) and
    the identity copy streams full-lane [1, Np*3] blocks at DMA rate.
    The output bitcasts to [K*Np, 3] for the row gather (fast per-index
    class, ~1.3 ns/row vs ~1.7 ns/ELEMENT for the element-gather class
    the column-major stacked table falls into).

    MEASURED IN SITU (98k-atom bench): 3.02e6 at-st/s vs 3.64e6 default —
    the pin still LOSES, same as pin_rows3.  The default path's mirror
    gather fuses with its producer; ANY materialized interleave (however
    cheap the copy) costs more than the slow gather class saves.  Kept
    flag-gated (LPT_MIR=pin2) as a documented dead end.
    """
    K, Np, three = planes_stacked.shape
    flat2 = planes_stacked.reshape(K, Np * three)
    out = _pin2_call(flat2, interpret=interpret)
    return out.reshape(K * Np, three)
