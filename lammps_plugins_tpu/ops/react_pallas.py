"""Pallas TPU kernel: block-sparse REBO reaction combine (mirror-free).

Replaces the step-time mirror-edge gather (neighbor.mirror_combine /
the mirT gather in potentials/rebomos.py) — the TPU answer to LAMMPS's
newton-pair reverse accumulation (pair_aeam.cpp:257, pair_rebomos.cpp's
f[j] -= updates).  The physics is unchanged:

    F_i = sum_k G[i, k]  -  sum_{edges e=(j, i')} G_e,  owner(i') = i

where G = dE/dd per directed edge ([K, Np] planes from ops/rebo_pallas).
The second (reaction) sum is a sparse all-to-all over ~2M edges; as an
XLA gather over the 23.5 MB cotangent table it runs ~10 ms/step at 98k
atoms (the measured emitter floor — see ARCHITECTURE.md mirror-gather
findings).  This kernel restructures it as dense VPU work over
spatially-local blocks:

  * Atoms are spatially sorted (api/scenes.spatial_sort), so the source
    columns of every edge targeting one 128-atom output chunk lie in a
    handful (NW ~ 24 measured at 98k) of 128-column blocks, found at
    rebuild time.
  * Grid (nch, NW): program (c, w) streams source block rblocks[c, w]
    of the G planes through VMEM (auto double-buffered via the
    scalar-prefetched BlockSpec index maps, block-sparse-attention
    style).
  * Route table (rebuild-time, so the step pays nothing for it):
    route[c, w, kc, col] = (k_src << 8 | target_lane) of the kc-th edge
    from source column col of block w into chunk c; -1 invalid.
    k-select is a K-deep where-chain per (kc, col) — exact, no gather.
  * Selected values V stack into per-chunk scratch rows at PACKED
    offsets qoff[c, w] (each block contributes only its own measured
    depth — the dense [NW, KC] layout would be ~3x more rows at the
    measured multiplicity histogram); at the last window the stack is
    transposed once and routed to output lanes by a one-hot
    compare-accumulate (entries on sublanes, output lanes on lanes —
    full (8,128)-tile VPU work, QR iterations).

Everything data-dependent (block lists, routes, offsets) is computed at
rebuild (build_route_tables) and amortized over the fused segment loop;
the kernel itself is gather-free and scatter-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import out_struct


def _make_kernel(K: int, NW: int, KC: int, QR: int):
    def kernel(rb_ref, qo_ref, gx_ref, gy_ref, gz_ref, rt_ref, gxo_ref,
               gyo_ref, gzo_ref, out_ref, vs_ref, ls_ref):
        c = pl.program_id(0)
        w = pl.program_id(1)

        @pl.when(w == 0)
        def _():
            # stale lane ids from the previous chunk must not route: 255
            # never matches an output lane.  (Stale V values are harmless
            # once their lane is invalid, so vs needs no init.)
            ls_ref[...] = jnp.full((QR + KC, 128), 255, jnp.int32)

        r = rt_ref[0, 0]                          # [KC, 128] int32
        kk = r >> 8                               # -1 stays -1 (no match)
        lane = jnp.bitwise_and(r, 255)            # invalid -> 255

        dtype = gx_ref.dtype
        zero = jnp.zeros((KC, 128), dtype)
        vx, vy, vz = zero, zero, zero
        for k in range(K):
            m = kk == k
            vx = jnp.where(m, gx_ref[k:k + 1, :], vx)
            vy = jnp.where(m, gy_ref[k:k + 1, :], vy)
            vz = jnp.where(m, gz_ref[k:k + 1, :], vz)
        q0 = qo_ref[c, w]
        # blocks write their full [KC, 128] slab at the packed offset;
        # rows past a block's real depth are overwritten by the next
        # block (same offset) or stay lane-invalid from the w==0 init
        vs_ref[0, pl.ds(q0, KC), :] = vx
        vs_ref[1, pl.ds(q0, KC), :] = vy
        vs_ref[2, pl.ds(q0, KC), :] = vz
        ls_ref[pl.ds(q0, KC), :] = lane

        @pl.when(w == NW - 1)
        def _():
            # route the stacked selected values to their target lanes
            vxt = jnp.swapaxes(vs_ref[0], 0, 1)   # [128, QR + KC]
            vyt = jnp.swapaxes(vs_ref[1], 0, 1)
            vzt = jnp.swapaxes(vs_ref[2], 0, 1)
            lst = jnp.swapaxes(ls_ref[...], 0, 1)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            zacc = jnp.zeros((128, 128), dtype)
            ax, ay, az = zacc, zacc, zacc
            for q in range(QR):
                mq = lst[:, q:q + 1] == iota_l    # [128, 128]
                ax = ax + jnp.where(mq, vxt[:, q:q + 1], 0.0)
                ay = ay + jnp.where(mq, vyt[:, q:q + 1], 0.0)
                az = az + jnp.where(mq, vzt[:, q:q + 1], 0.0)
            fx = jnp.sum(gxo_ref[...], axis=0, keepdims=True) \
                - jnp.sum(ax, axis=0, keepdims=True)
            fy = jnp.sum(gyo_ref[...], axis=0, keepdims=True) \
                - jnp.sum(ay, axis=0, keepdims=True)
            fz = jnp.sum(gzo_ref[...], axis=0, keepdims=True) \
                - jnp.sum(az, axis=0, keepdims=True)
            zrow = jnp.zeros((1, 128), dtype)
            out_ref[...] = jnp.concatenate(
                [fx, fy, fz, zrow, zrow, zrow, zrow, zrow], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("QR", "interpret"))
def react_combine(gx, gy, gz, rblocks, qoff, route, QR: int,
                  interpret=False):
    """REBO atom forces from edge cotangents via rebuild-time routes.

    Args:
      gx, gy, gz: [K, Np] per-edge cotangent planes (Np = 128 * nch).
      rblocks: [nch, NW] int32 source-block ids per target chunk (pad 0).
      qoff: [nch, NW] int32 packed scratch-row offset per window.
      route: [nch, NW, KC, 128] int32 packed (k_src << 8) | target_lane,
        -1 for invalid slots.
      QR: static packed-row capacity (route-loop bound).
    Returns F [Np, 3] forces (own-row sum minus routed reaction sum).
    """
    K, Np = gx.shape
    nch, NW, KC, _ = route.shape
    kernel = _make_kernel(K, NW, KC, QR)

    def gblk(c, w, rb, qo):
        return (0, rb[c, w])

    def gown(c, w, rb, qo):
        return (0, c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nch, NW),
        in_specs=[
            pl.BlockSpec((K, 128), gblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 128), gblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 128), gblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, KC, 128),
                         lambda c, w, rb, qo: (c, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 128), gown, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 128), gown, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 128), gown, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda c, w, rb, qo: (0, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, QR + KC, 128), gx.dtype),
            pltpu.VMEM((QR + KC, 128), jnp.int32),
        ],
    )
    F = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_struct((8, Np), gx.dtype, gx),
        cost_estimate=pl.CostEstimate(
            flops=nch * (NW * KC * 128 * K * 4 + QR * 128 * 128 * 7),
            bytes_accessed=nch * NW * (K + KC) * 128 * 4,
            transcendentals=0),
        interpret=interpret,
    )(rblocks, qoff, gx, gy, gz, route, gx, gy, gz)
    return jnp.swapaxes(F[0:3], 0, 1)


def build_route_tables(idx, mask, mirror, owner, n: int, K: int,
                       NW: int, KC: int, QR: int = 0):
    """Rebuild-time route construction for react_combine.

    Args:
      idx/mask: the [N, K] neighbor list (indices into owned+ghost rows).
      mirror: [N, K] flat mirror slots (validity source: an edge
        participates in the reaction iff its mirror was resolved — exact
        parity with the XLA mirror-gather path).
      owner: [Mg] ghost -> owner map.
      n, K: list shape; NW/KC: static route capacities.
    Returns (rblocks [nch, NW] i32, qoff [nch, NW] i32,
             route [nch, NW, KC, 128] i32 packed,
             nw_needed, kc_needed, rq_needed, overflow).
    The counts are measured exactly so the engine can ratchet NW/KC/QR
    (same policy as kmax).  NW == 0 runs in counts-only mode (table
    outputs are None): the engine's enablement decision needs the
    measured geometry before any plan carries capacities.
    """
    Np = -(-n // 128) * 128
    nch = Np // 128
    nblk = nch
    valid = mask & (mirror >= 0)
    owner_all = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32), owner.astype(jnp.int32)])
    otgt = owner_all[jnp.clip(idx, 0, owner_all.shape[0] - 1)]   # [N, K]
    c = otgt // 128
    src = jax.lax.broadcasted_iota(jnp.int32, (n, K), 0)
    b = src // 128

    # per-edge depth: rank among earlier same-row edges targeting the
    # same chunk ([N, K, K] lower-triangular compare)
    same = (c[:, :, None] == c[:, None, :]) & valid[:, None, :]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 2)
           < jax.lax.broadcasted_iota(jnp.int32, (1, K, K), 1))
    kcr = jnp.sum(same & tri, axis=2).astype(jnp.int32)
    kc_needed = (jnp.max(jnp.where(valid, kcr, 0)) + 1).astype(jnp.int32)

    # (target chunk, source block): marked iff any edge, with its max
    # per-column depth (the block's packed row count)
    pid = c * nblk + b
    pid_s = jnp.where(valid, pid, nch * nblk)
    depthm = jnp.zeros((nch * nblk + 1,), jnp.int32).at[
        pid_s.reshape(-1)].max((kcr + 1).reshape(-1), mode="drop")[:-1]
    markm = (depthm > 0).reshape(nch, nblk)
    nw_count = jnp.sum(markm, axis=1)
    nw_needed = jnp.max(nw_count).astype(jnp.int32)

    iota_b = jax.lax.broadcasted_iota(jnp.int32, (nch, nblk), 1)
    blk_sorted, depth_sorted = jax.lax.sort(
        (jnp.where(markm, iota_b, nblk), depthm.reshape(nch, nblk)),
        dimension=1, num_keys=1)
    if NW > nblk:
        # tiny systems can have fewer source blocks than the NW quantum;
        # the kernel grid still runs NW steps, so the scalar tables must
        # be NW wide (pad windows: depth 0, block 0, offset = total)
        pad = ((0, 0), (0, NW - nblk))
        blk_sorted = jnp.pad(blk_sorted, pad, constant_values=nblk)
        depth_sorted = jnp.pad(depth_sorted, pad)
    # packed row offsets over ALL marked blocks (exclusive cumsum); the
    # needed capacity is measured on the full set, the emitted tables
    # take the first NW windows
    qoff_full = jnp.cumsum(depth_sorted, axis=1) - depth_sorted
    rq_needed = jnp.max(qoff_full + depth_sorted).astype(jnp.int32)

    if NW <= 0:
        return (None, None, None, nw_needed, kc_needed, rq_needed,
                jnp.zeros((), jnp.bool_))

    rblocks = jnp.where(blk_sorted[:, :NW] < nblk, blk_sorted[:, :NW], 0)
    # clamp to QR: on packed-row overflow the surplus blocks write into
    # the sacrificial [QR, QR+KC) scratch rows (the overflow flag
    # discards the span before any force is consumed)
    qoff = jnp.minimum(qoff_full[:, :NW], QR).astype(jnp.int32)

    # per-edge window index: rank of b among marked blocks of c
    cum = jnp.cumsum(markm.astype(jnp.int32), axis=1).reshape(-1)
    w_e = cum[jnp.minimum(pid, nch * nblk - 1)] - 1

    lane_t = otgt % 128
    kslot = jax.lax.broadcasted_iota(jnp.int32, (n, K), 1)
    packed = (kslot << 8) | lane_t
    fits = valid & (w_e < NW) & (kcr < KC)
    total = nch * NW * KC * 128
    pos = ((c * NW + w_e) * KC + kcr) * 128 + (src % 128)
    pos_s = jnp.where(fits, pos, total)
    route = jnp.full((total + 1,), -1, jnp.int32).at[
        pos_s.reshape(-1)].set(packed.reshape(-1), mode="drop")[:-1]
    overflow = (nw_needed > NW) | (kc_needed > KC) | (rq_needed > QR)
    return (rblocks.astype(jnp.int32), qoff,
            route.reshape(nch, NW, KC, 128),
            nw_needed, kc_needed, rq_needed, overflow)
