"""Pallas TPU kernel: smallest-K selection over padded candidate rows.

The device neighbor rebuild must compact each atom's ~650 cell-window
candidates down to the K nearest (neighbor/device_build.py).  XLA's
`lax.top_k` on a [98k, 648] f32 array costs ~900 ms on TPU — it sorts far
more than needed.  This kernel does K rounds of (min, argmin, mask) per row
block entirely in VMEM: ~10 G lane-ops for K=32, a few milliseconds.

Semantics match top_k(-keys, K): returns, per row, the column positions of
the K smallest keys in ascending order; exhausted slots return W (one past
the last column).  Invalid candidates must be pre-masked to +inf.  Ties are
broken by lowest column index, one extraction per round, so duplicates are
preserved exactly like a sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(K: int, NB: int, W: int):
    def kernel(key_ref, pos_ref):
        key = key_ref[...]                              # [NB, W] f32
        cols = jax.lax.broadcasted_iota(jnp.int32, (NB, W), 1)
        outs = []
        for _ in range(K):
            val = jnp.min(key, axis=1, keepdims=True)   # [NB, 1]
            hit = key == val
            pos = jnp.min(jnp.where(hit, cols, W), axis=1, keepdims=True)
            pos = jnp.where(val < jnp.inf, pos, W)      # exhausted row
            key = jnp.where(cols == pos, jnp.inf, key)
            outs.append(pos)
        pos_ref[...] = jnp.concatenate(outs, axis=1)    # [NB, K]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def select_k(keys: jnp.ndarray, k: int, interpret: bool = False):
    """Positions of the k smallest entries per row, ascending; W = invalid.

    keys: [N, W] f32 with +inf marking invalid slots.  N is padded to a
    block multiple internally; W should be lane-friendly (the caller pads
    candidate rows to a multiple of 128 with +inf).
    """
    N, W = keys.shape
    NB = 256
    Np = -(-N // NB) * NB
    padded = jnp.pad(keys, ((0, Np - N), (0, 0)),
                     constant_values=jnp.inf)
    out = pl.pallas_call(
        _make_kernel(k, NB, W),
        grid=(Np // NB,),
        in_specs=[pl.BlockSpec((NB, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((NB, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, k), jnp.int32),
        cost_estimate=pl.CostEstimate(flops=Np * W * k * 4,
                                      bytes_accessed=Np * W * 4,
                                      transcendentals=0),
        interpret=interpret,
    )(padded)
    return out[:N]
