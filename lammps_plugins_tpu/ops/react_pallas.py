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


#: windows per stack-kernel grid step (amortizes program overhead; NW is
#: quantized to a multiple of this by choose_react)
WG = 4
#: packed entries per route-kernel grid step (static in-block slicing;
#: QR is quantized to a multiple of this)
QB = 16


def _make_stack_kernel(K: int, NW: int, KC: int, QR: int):
    """Phase A: k-select each window's route entries from its G block and
    stack them (packed offsets) into the per-chunk transposed entry
    tables consumed by the route kernel."""
    NWG = NW // WG

    def kernel(rb_ref, qo_ref, *refs):
        g_refs = refs[0:3 * WG]               # WG windows x (gx, gy, gz)
        rt_ref = refs[3 * WG]
        vx_ref, vy_ref, vz_ref, lt_ref = refs[3 * WG + 1:3 * WG + 5]
        vs_ref, ls_ref = refs[3 * WG + 5:]
        c = pl.program_id(0)
        wg = pl.program_id(1)

        @pl.when(wg == 0)
        def _():
            # stale lane ids from the previous chunk must not route: 255
            # never matches an output lane.  (Stale V values are harmless
            # once their lane is invalid, so vs needs no init.)
            ls_ref[...] = jnp.full((QR + KC, 128), 255, jnp.int32)

        dtype = vs_ref.dtype
        for i in range(WG):
            r = rt_ref[0, i]                      # [KC, 128] int32
            kk = r >> 8                           # -1 stays -1 (no match)
            lane = jnp.bitwise_and(r, 255)        # invalid -> 255
            zero = jnp.zeros((KC, 128), dtype)
            vx, vy, vz = zero, zero, zero
            gxw, gyw, gzw = g_refs[3 * i:3 * i + 3]
            for k in range(K):
                m = kk == k
                vx = jnp.where(m, gxw[k:k + 1, :], vx)
                vy = jnp.where(m, gyw[k:k + 1, :], vy)
                vz = jnp.where(m, gzw[k:k + 1, :], vz)
            q0 = qo_ref[c, wg * WG + i]
            # blocks write their full [KC, 128] slab at the packed
            # offset; rows past a block's real depth are overwritten by
            # the next block (same offset) or stay lane-invalid from the
            # wg==0 init
            vs_ref[0, pl.ds(q0, KC), :] = vx
            vs_ref[1, pl.ds(q0, KC), :] = vy
            vs_ref[2, pl.ds(q0, KC), :] = vz
            ls_ref[pl.ds(q0, KC), :] = lane

        @pl.when(wg == NWG - 1)
        def _():
            # emit [NJ, 128, QB] per chunk: the route kernel's BlockSpec
            # needs its last dim full (QB) — lane-dim blocks must be
            # 128-divisible or whole
            vxt = jnp.swapaxes(vs_ref[0], 0, 1)       # [128, QR + KC]
            vyt = jnp.swapaxes(vs_ref[1], 0, 1)
            vzt = jnp.swapaxes(vs_ref[2], 0, 1)
            lst = jnp.swapaxes(ls_ref[...], 0, 1)
            for j in range(QR // QB):
                sl = slice(j * QB, (j + 1) * QB)
                vx_ref[0, j] = vxt[:, sl]
                vy_ref[0, j] = vyt[:, sl]
                vz_ref[0, j] = vzt[:, sl]
                lt_ref[0, j] = lst[:, sl]

    return kernel


def _make_route_kernel(QR: int):
    """Phase B: one-hot lane routing of the stacked entries.

    Grid (nch, QR // QB): every slice index is static (Mosaic rejects
    unaligned dynamic lane indices) and the only cross-step state is the
    [8, 128] accumulator in scratch — the fori/rotating-carry forms spent
    ~700 cycles/entry on register-carry spills."""
    NJ = QR // QB

    def kernel(vx_ref, vy_ref, vz_ref, lt_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        dtype = vx_ref.dtype
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        zacc = jnp.zeros((128, 128), dtype)
        ax, ay, az = zacc, zacc, zacc
        lr = lt_ref[0, 0]                         # [128, QB]
        for q in range(QB):
            mq = lr[:, q:q + 1] == iota_l         # [128, 128]
            ax = ax + jnp.where(mq, vx_ref[0, 0, :, q:q + 1], 0.0)
            ay = ay + jnp.where(mq, vy_ref[0, 0, :, q:q + 1], 0.0)
            az = az + jnp.where(mq, vz_ref[0, 0, :, q:q + 1], 0.0)
        acc_ref[0:1, :] = acc_ref[0:1, :] + jnp.sum(ax, axis=0,
                                                    keepdims=True)
        acc_ref[1:2, :] = acc_ref[1:2, :] + jnp.sum(ay, axis=0,
                                                    keepdims=True)
        acc_ref[2:3, :] = acc_ref[2:3, :] + jnp.sum(az, axis=0,
                                                    keepdims=True)

        @pl.when(j == NJ - 1)
        def _():
            out_ref[...] = acc_ref[...]

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
      QR: static packed-row capacity (multiple of QB).
    Returns F [Np, 3] forces (own-row sum minus routed reaction sum).
    """
    K, Np = gx.shape
    nch, NW, KC, _ = route.shape
    assert NW % WG == 0 and QR % QB == 0, (NW, QR)

    stack_kernel = _make_stack_kernel(K, NW, KC, QR)

    def gblk(i):
        return lambda c, wg, rb, qo: (0, rb[c, wg * WG + i])

    in_specs = []
    for i in range(WG):
        in_specs += [pl.BlockSpec((K, 128), gblk(i),
                                  memory_space=pltpu.VMEM)] * 3
    in_specs.append(pl.BlockSpec((1, WG, KC, 128),
                                 lambda c, wg, rb, qo: (c, wg, 0, 0),
                                 memory_space=pltpu.VMEM))
    NJ = QR // QB
    tstruct = out_struct((nch, NJ, 128, QB), gx.dtype, gx)
    lstruct = out_struct((nch, NJ, 128, QB), jnp.int32, gx)
    tspec = pl.BlockSpec((1, NJ, 128, QB),
                         lambda c, wg, rb, qo: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    vxt, vyt, vzt, lt = pl.pallas_call(
        stack_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nch, NW // WG),
            in_specs=in_specs,
            out_specs=(tspec, tspec, tspec, tspec),
            scratch_shapes=[
                pltpu.VMEM((3, QR + KC, 128), gx.dtype),
                pltpu.VMEM((QR + KC, 128), jnp.int32),
            ],
        ),
        out_shape=(tstruct, tstruct, tstruct, lstruct),
        cost_estimate=pl.CostEstimate(
            flops=nch * NW * KC * 128 * K * 4,
            bytes_accessed=nch * NW * (3 * K + KC) * 128 * 4,
            transcendentals=0),
        interpret=interpret,
    )(rblocks, qoff, gx, gy, gz, gx, gy, gz, gx, gy, gz, gx, gy, gz,
      route)

    route_kernel = _make_route_kernel(QR)
    bspec = pl.BlockSpec((1, 1, 128, QB), lambda c, j: (c, j, 0, 0),
                         memory_space=pltpu.VMEM)
    R = pl.pallas_call(
        route_kernel,
        grid=(nch, QR // QB),
        in_specs=[bspec, bspec, bspec, bspec],
        out_specs=pl.BlockSpec((8, 128), lambda c, j: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=out_struct((8, Np), gx.dtype, gx),
        scratch_shapes=[pltpu.VMEM((8, 128), gx.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=nch * QR * 128 * 128 * 7,
            bytes_accessed=nch * QR * 128 * 16, transcendentals=0),
        interpret=interpret,
    )(vxt, vyt, vzt, lt)

    # own-row sums and the combine stay in XLA (they fuse with the
    # surrounding step; keeping them out of the kernels also drops the
    # redundant own-block DMAs)
    fx = jnp.sum(gx, axis=0) - R[0]
    fy = jnp.sum(gy, axis=0) - R[1]
    fz = jnp.sum(gz, axis=0) - R[2]
    return jnp.stack([fx, fy, fz], axis=-1)


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
