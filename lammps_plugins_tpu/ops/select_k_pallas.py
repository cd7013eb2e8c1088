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


def _make_kernel(K: int, NB: int, W: int, n_payload: int, dtype=jnp.float32):
    def kernel(key_ref, *refs):
        pay_refs = refs[:n_payload]
        pos_ref = refs[n_payload]
        pout_refs = refs[n_payload + 1:-1]
        scratch = refs[-1]
        scratch[...] = key_ref[...]                     # mutable key copy
        cols = jax.lax.broadcasted_iota(jnp.int32, (NB, W), 1)
        colk = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 1)

        # fori_loop + scratch: an unrolled K-loop materializes K copies of
        # the [NB, W] key block and blows the VMEM stack (31 MB at K=32).
        # Results accumulate into loop-carried [NB, K] values via a
        # one-hot lane mask (dynamic lane-index stores are unsupported).
        init = (jnp.zeros((NB, K), jnp.int32),) + tuple(
            jnp.zeros((NB, K), dtype) for _ in pay_refs)

        def body(k, carry):
            key = scratch[...]
            val = jnp.min(key, axis=1, keepdims=True)   # [NB, 1]
            hit = key == val
            pos = jnp.min(jnp.where(hit, cols, W), axis=1, keepdims=True)
            sel = cols == pos
            scratch[...] = jnp.where(sel, jnp.inf, key)
            here = colk == k
            pos_acc = jnp.where(here, jnp.where(val < jnp.inf, pos, W),
                                carry[0])
            pays = []
            for i, pr in enumerate(pay_refs):
                pv = jnp.sum(jnp.where(sel, pr[...], 0.0), axis=1,
                             keepdims=True)
                pays.append(jnp.where(here, pv, carry[1 + i]))
            return (pos_acc,) + tuple(pays)

        final = jax.lax.fori_loop(0, K, body, init)
        pos_ref[...] = final[0]
        for i, r in enumerate(pout_refs):
            r[...] = final[1 + i]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def select_k(keys: jnp.ndarray, k: int, interpret: bool = False,
             payloads=()):
    """Positions of the k smallest entries per row, ascending; W = invalid.

    keys: [N, W] f32 with +inf marking invalid slots.  N is padded to a
    block multiple internally; W should be lane-friendly (the caller pads
    candidate rows to a multiple of 128 with +inf).

    payloads: optional f32 [N, W] arrays; for each, the kernel also emits
    the [N, k] values at the selected positions (in-VMEM one-hot reduce).
    Post-hoc gathers of 63M-element candidate arrays cost ~55 ms each on
    TPU (scalar-path lowering); in-kernel extraction is ~2 ms per payload.
    Returns pos [N, k] or (pos, *selected) when payloads are given.
    """
    N, W = keys.shape
    # block size bounded by VMEM: inputs + scratch + pipelining buffers
    NB = 256
    while NB > 8 and (4 + len(payloads)) * NB * W * 4 > 10 * 2 ** 20:
        NB //= 2
    Np = -(-N // NB) * NB

    def padr(a, fill):
        return jnp.pad(a, ((0, Np - N), (0, 0)), constant_values=fill)

    padded = padr(keys, jnp.inf)
    pay = [padr(p.astype(keys.dtype), 0.0) for p in payloads]
    blkW = pl.BlockSpec((NB, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blkK = pl.BlockSpec((NB, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    from .common import out_struct
    shapeK = out_struct((Np, k), keys.dtype, keys)
    out = pl.pallas_call(
        _make_kernel(k, NB, W, len(pay), keys.dtype),
        grid=(Np // NB,),
        in_specs=[blkW] * (1 + len(pay)),
        out_specs=(blkK,) + (blkK,) * len(pay),
        out_shape=(out_struct((Np, k), jnp.int32, keys),)
        + (shapeK,) * len(pay),
        scratch_shapes=[pltpu.VMEM((NB, W), keys.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=Np * W * k * (4 + 2 * len(pay)),
            bytes_accessed=Np * W * 4 * (1 + len(pay)), transcendentals=0),
        interpret=interpret,
    )(padded, *pay)
    if not payloads:
        return out[0][:N]
    return tuple(o[:N] for o in out)
