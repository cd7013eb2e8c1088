"""Pallas TPU kernel: REBO bond-order forces with hand-derived gradients.

Replaces the XLA vjp over `_rebo_energy_core` (potentials/rebomos.py) on the
force-only hot path.  The physics is identical — the energy is

    E_i = 1/2 sum_j live_j * w_j * (fR_j - pij_j * fA_j)
    pij_j = (1 + sum_{k!=j} w_k g(cos th_jk) + P(N_i))^(-1/2)

(pair_rebomos.cpp:358-847; g/P/Sp from pair_rebomos.h) and the kernel emits
the analytic per-edge cotangent G_e = dE/dd_e, derived by hand (the
reference's own force loop, cpp:634-843, is the same chain rule).  The XLA
caller turns G into atom forces via the row sum and the mirror-edge gather,
exactly like the autodiff path.

Why a kernel: the [N, K, K] angular tensors (cos, g, g', M) never touch HBM
— under XLA the forward residuals plus the backward sweep moved >4 GB per
step (80 ms at 98k atoms); here each block's pair tensors live entirely in
VMEM (~3 MB).

Layout: edge slots on SUBLANES, atoms on LANES.  All inputs/outputs are
[K, N] (transposed once in XLA, ~free); pair tensors are [K, K, NB] with NB
= 128 atoms per grid program.  Per-pair-type constants enter as bilinear
(center element, neighbor element) FMAs; per-center polynomial coefficients
(g spline, P coordination) as linear-in-element rows.

Masking: rsq of invalid slots is replaced by 1.0 (as in the XLA path), w and
w' carry the mask factor, and every other term is proportional to w or
live*w, so padded slots contribute exact zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOL = 1.0e-9      # pair_rebomos.cpp:52


def derive_rebo_constants(tables) -> dict:
    """Static scalars for the kernel.

    'pair:<name>': bilinear 4-tuples over (center el, neighbor el) — rcmin,
    inv_drc = 1/(rcmax-rcmin), Q, A, alpha, BIJc, Beta.
    'ctr:<name>': linear 2-tuples (c0, c1) over the center element — the g
    spline rows b0..b6 / bg0..bg6 and coordination a0..a3.
    """
    t = tables
    out = {}

    def bil(P):
        return (float(P[0, 0]), float(P[1, 0] - P[0, 0]),
                float(P[0, 1] - P[0, 0]),
                float(P[1, 1] - P[1, 0] - P[0, 1] + P[0, 0]))

    drc = np.asarray(t.rcmax, np.float64) - np.asarray(t.rcmin, np.float64)
    for name, P in (("rcmin", t.rcmin), ("inv_drc", 1.0 / drc),
                    ("Q", t.Q), ("A", t.A), ("alpha", t.alpha),
                    ("BIJc", t.BIJc), ("Beta", t.Beta)):
        out["pair:" + name] = bil(np.asarray(P, np.float64))
    b = np.asarray(t.b, np.float64)      # [2, 7]
    bg = np.asarray(t.bg, np.float64)
    a = np.asarray(t.a, np.float64)      # [2, 4]
    for i in range(7):
        out[f"ctr:b{i}"] = (float(b[0, i]), float(b[1, i] - b[0, i]))
        out[f"ctr:bg{i}"] = (float(bg[0, i]), float(bg[1, i] - bg[0, i]))
    for i in range(4):
        out[f"ctr:a{i}"] = (float(a[0, i]), float(a[1, i] - a[0, i]))
    return out


def _make_kernel(consts: dict, K: int, NB: int, emit_rows: bool = False):
    pi = float(np.pi)

    def kernel(dx_ref, dy_ref, dz_ref, jel_ref, msk_ref, ei_ref,
               gx_ref, gy_ref, gz_ref, *rows_ref):
        dtype = dx_ref.dtype
        dx = dx_ref[...]                    # [K, NB]
        dy = dy_ref[...]
        dz = dz_ref[...]
        ej = jel_ref[...]                   # [K, NB] neighbor element (0/1)
        mf = msk_ref[...]                   # [K, NB] mask as float
        eI = ei_ref[0:1, :]                 # [1, NB] center element

        def pairc(name):
            a0, a1, b0, b1 = consts["pair:" + name]
            return (a0 + a1 * eI) + (b0 + b1 * eI) * ej     # [K, NB]

        def ctrc(name):
            c0, c1 = consts["ctr:" + name]
            return c0 + c1 * eI                             # [1, NB]

        rsq = dx * dx + dy * dy + dz * dz
        rsq = jnp.where(mf > 0, rsq, jnp.ones_like(rsq))
        rsq = jnp.maximum(rsq, 1e-12)
        rinv = jax.lax.rsqrt(rsq)
        r = rsq * rinv

        # -- switching function w and w' (Sp, pair_rebomos.h:195-211) ------
        inv_drc = pairc("inv_drc")
        t = (r - pairc("rcmin")) * inv_drc
        tc = jnp.clip(t, 0.0, 1.0)
        mid = 0.5 * (1.0 + jnp.cos(tc * pi))
        w = jnp.where(t <= 0.0, jnp.ones_like(mid),
                      jnp.where(t >= 1.0, jnp.zeros_like(mid), mid)) * mf
        interior = jnp.logical_and(t > 0.0, t < 1.0)
        wp = jnp.where(interior, (-0.5 * pi) * inv_drc * jnp.sin(tc * pi),
                       jnp.zeros_like(mid)) * mf

        # -- pair repulsion/attraction radial factors ----------------------
        Q = pairc("Q")
        A = pairc("A")
        al = pairc("alpha")
        eR = A * jnp.exp(-al * r)
        fR = (1.0 + Q * rinv) * eR
        fRp = -eR * (Q * rinv * rinv + al * (1.0 + Q * rinv))
        fA = pairc("BIJc") * jnp.exp(-pairc("Beta") * r)
        fAp = -pairc("Beta") * fA

        # -- coordination (PijSpline, pair_rebomos.h:173-179) --------------
        nM = jnp.sum(w * (1.0 - ej), axis=0, keepdims=True)   # [1, NB]
        nS = jnp.sum(w * ej, axis=0, keepdims=True)
        Ncoord = nM + nS
        a1c = ctrc("a1")
        a2c = ctrc("a2")
        expN = a1c * jnp.exp(-a2c * Ncoord)
        P = -ctrc("a0") * (Ncoord - 1.0) - expN + ctrc("a3")
        Pp = -ctrc("a0") + a2c * expN

        # -- angular pair tensors [K(j), K(k), NB] --------------------------
        dxj = dx.reshape(K, 1, NB)
        dxk = dx.reshape(1, K, NB)
        dyj = dy.reshape(K, 1, NB)
        dyk = dy.reshape(1, K, NB)
        dzj = dz.reshape(K, 1, NB)
        dzk = dz.reshape(1, K, NB)
        dots = dxj * dxk + dyj * dyk + dzj * dzk
        riv = rinv.reshape(K, 1, NB) * rinv.reshape(1, K, NB)
        cos = jnp.clip(dots * riv, -1.0, 1.0)

        # g spline + derivative (pair_rebomos.h:68-167): two sixth-degree
        # polynomials blended by psi for cos >= 0.5
        def poly_and_deriv(prefix):
            c6 = ctrc(prefix + "6").reshape(1, 1, NB)
            val = jnp.broadcast_to(c6, cos.shape)
            der = jnp.zeros_like(cos)
            for kk in range(5, -1, -1):
                der = der * cos + val
                val = val * cos + ctrc(prefix + str(kk)).reshape(1, 1, NB)
            return val, der

        gb, gbp = poly_and_deriv("b")
        gm, gmp = poly_and_deriv("bg")
        # psi = (1 - cos(2 pi (c - 1/2)))/2 = sin^2(pi u), psip = dpsi/dc
        # = 2 pi sin(pi u) cos(pi u), u = c - 1/2.  Consumed only where
        # c >= 1/2, so x = pi u is in [0, pi/2]: short restricted-range
        # polynomials (max err ~1.4e-7, f32 rounding level) replace the
        # two full-range transcendentals — these were 2 per ANGULAR PAIR,
        # the single most expensive ops in the [K, K, NB] block.
        x = pi * (cos - 0.5)
        x2 = x * x
        sn = x * (0.9999999827780359 + x2 * (-0.16666651517228095
             + x2 * (8.332963963586747e-3 + x2 * (-1.9804751716368766e-4
             + x2 * 2.5981027733145177e-6))))
        cn = 0.9999999998456863 + x2 * (-0.4999999951156645
             + x2 * (4.166664188188752e-2 + x2 * (-1.38884324042593e-3
             + x2 * (2.4763770582327046e-5 + x2 * -2.611502385625322e-7))))
        psi = sn * sn
        psip = (2.0 * pi) * sn * cn
        hi = cos >= 0.5
        diff = gm - gb
        g = jnp.where(hi, gb + psi * diff, gb)
        gp = jnp.where(hi, gbp + psip * diff + psi * (gmp - gbp), gbp)

        # slot-diagonal exclusion (k != j) and k validity
        eye = jax.lax.broadcasted_iota(jnp.int32, (K, K, 1), 0) \
            == jax.lax.broadcasted_iota(jnp.int32, (K, K, 1), 1)
        offd = jnp.where(eye, jnp.zeros((K, K, 1), dtype),
                         jnp.ones((K, K, 1), dtype))
        wk = w.reshape(1, K, NB) * offd                       # [K, K, NB]

        Etmp = jnp.sum(wk * g, axis=1)                        # [K, NB]
        pij = jax.lax.rsqrt(1.0 + Etmp + P)
        live = jnp.where(jnp.logical_and(mf > 0, w > TOL),
                         jnp.ones_like(w), jnp.zeros_like(w))
        T = 0.25 * live * w * fA * pij * pij * pij            # dE/dEtmp_j

        # M_jk = dE/dcos_jk = (T_j w_k + T_k w_j) g'_jk  (off-diagonal)
        Tj = T.reshape(K, 1, NB)
        Tk = T.reshape(1, K, NB)
        wj = w.reshape(K, 1, NB)
        M = (Tj * wk + Tk * wj * offd) * gp

        # dE/dw_m: direct + angular-weight + coordination
        Gg = jnp.sum(Tj * g * offd, axis=0)                   # sum over j
        ST = jnp.sum(T, axis=0, keepdims=True)                # [1, NB]
        dEdw = 0.5 * live * (fR - pij * fA) + Gg + ST * Pp
        dEdr = 0.5 * live * w * (fRp - pij * fAp)
        C1 = dEdr + dEdw * wp

        # cos chain: dcos_mk/dd_m = d_k/(r_m r_k) - cos * d_m / r_m^2
        S2 = jnp.sum(M * cos, axis=1)                         # [K, NB]
        Mr = M * riv
        cx = jnp.sum(Mr * dxk, axis=1)
        cy = jnp.sum(Mr * dyk, axis=1)
        cz = jnp.sum(Mr * dzk, axis=1)
        # S2 uses cos = dots/(r_m r_k); d(cos)/dd_m self-term has 1/r_m^2
        coef = C1 * rinv - S2 * rinv * rinv
        Gx = coef * dx + cx
        Gy = coef * dy + cy
        Gz = coef * dz + cz
        gx_ref[...] = Gx
        gy_ref[...] = Gy
        gz_ref[...] = Gz
        if emit_rows:
            # interleaved [K, NB, 4] edge-cotangent ROWS: the minor-dim-4
            # layout makes the downstream mirror combine ONE row gather
            # (the fast per-index class) instead of three element gathers
            # over component planes
            rows_ref[0][:, :, 0] = Gx
            rows_ref[0][:, :, 1] = Gy
            rows_ref[0][:, :, 2] = Gz

    return kernel


@functools.partial(jax.jit, static_argnames=("consts_key", "interpret",
                                             "emit_rows"))
def _rebo_call(dxT, dyT, dzT, jelT, mskT, eiT, *, consts_key, interpret,
               emit_rows=False):
    consts = dict(consts_key)
    K, Np = dxT.shape
    NB = 128
    kernel = _make_kernel(consts, K, NB, emit_rows)
    blk = pl.BlockSpec((K, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    blk8 = pl.BlockSpec((8, NB), lambda i: (0, i), memory_space=pltpu.VMEM)
    from .common import out_struct
    shape = out_struct((K, Np), dxT.dtype, dxT)
    out_specs = [blk, blk, blk]
    out_shape = [shape, shape, shape]
    if emit_rows:
        out_specs.append(pl.BlockSpec((K, NB, 4), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(out_struct((K, Np, 4), dxT.dtype, dxT))
    npair = Np * K * K
    return pl.pallas_call(
        kernel,
        grid=(Np // NB,),
        in_specs=[blk, blk, blk, blk, blk, blk8],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(flops=npair * 70,
                                      bytes_accessed=Np * K * 6 * 4,
                                      transcendentals=npair * 2),
        interpret=interpret,
    )(dxT, dyT, dzT, jelT, mskT, eiT)


def rebo_edge_cotangents(dx, dy, dz, jel, mask, el_own,
                         interpret: bool = False, consts: dict = None):
    """G_e = dE_REBO/dd_e for every edge of the [N, K] REBO list.

    Args: per-edge displacement components [N, K]; jel [N, K] neighbor
    element codes; mask [N, K] bool; el_own [N] center element codes.
    Returns (Gx, Gy, Gz) [N, K].
    """
    N, K = dx.shape
    Np = -(-N // 128) * 128
    dtype = dx.dtype

    def prep(arr, fill=0.0):
        arrT = jnp.swapaxes(arr.astype(dtype), 0, 1)       # [K, N]
        return jnp.pad(arrT, ((0, 0), (0, Np - N)),
                       constant_values=fill)

    dxT, dyT, dzT = prep(dx), prep(dy), prep(dz)
    jelT = prep(jel.astype(dtype))
    mskT = prep(mask.astype(dtype))
    eiT = jnp.pad(el_own.astype(dtype).reshape(1, N),
                  ((0, 7), (0, Np - N)))
    consts_key = tuple(sorted(consts.items()))
    gx, gy, gz = _rebo_call(dxT, dyT, dzT, jelT, mskT, eiT,
                            consts_key=consts_key, interpret=interpret)
    return (jnp.swapaxes(gx[:, :N], 0, 1),
            jnp.swapaxes(gy[:, :N], 0, 1),
            jnp.swapaxes(gz[:, :N], 0, 1))
