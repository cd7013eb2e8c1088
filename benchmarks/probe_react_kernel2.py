"""Bisect the reaction kernel's 53 ms: which phase costs what.

Variants (probe-local copies of the kernel with phases disabled):
  full      — as shipped
  noroute   — k-select + stack + transposes, no route fori
  notrans   — k-select + stack only (own-sum output)
  nosel     — DMA + route only (V = G rows directly, no k-select)
Timings on the real chip at bench shapes.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 97920
K = 20
NW, KC, QR = 28, 10, 80
Np = -(-N // 128) * 128
nch = Np // 128

rng = np.random.default_rng(0)
gx = jnp.asarray(rng.normal(size=(K, Np)).astype(np.float32))
gy = jnp.asarray(rng.normal(size=(K, Np)).astype(np.float32))
gz = jnp.asarray(rng.normal(size=(K, Np)).astype(np.float32))
rblocks = jnp.asarray(
    np.clip(np.arange(nch)[:, None] + rng.integers(-14, 14, (nch, NW)),
            0, nch - 1).astype(np.int32))
qoff = jnp.asarray(
    np.minimum(np.arange(NW)[None, :].repeat(nch, 0) * 2, QR)
    .astype(np.int32))
route_np = rng.integers(0, K, (nch, NW, KC, 128)).astype(np.int32) << 8
route_np |= rng.integers(0, 128, (nch, NW, KC, 128))
route_np[rng.random((nch, NW, KC, 128)) < 0.6] = -1
route = jnp.asarray(route_np)


def make_kernel(mode):
    def kernel(rb_ref, qo_ref, gx_ref, gy_ref, gz_ref, rt_ref, gxo_ref,
               gyo_ref, gzo_ref, out_ref, vs_ref, ls_ref):
        c = pl.program_id(0)
        w = pl.program_id(1)

        @pl.when(w == 0)
        def _():
            ls_ref[...] = jnp.full((QR + KC, 128), 255, jnp.int32)

        r = rt_ref[0, 0]
        kk = r >> 8
        lane = jnp.bitwise_and(r, 255)
        dtype = gx_ref.dtype
        if mode == "nosel":
            vx = gx_ref[0:KC, :]
            vy = gy_ref[0:KC, :]
            vz = gz_ref[0:KC, :]
        else:
            zero = jnp.zeros((KC, 128), dtype)
            vx, vy, vz = zero, zero, zero
            for k in range(K):
                m = kk == k
                vx = jnp.where(m, gx_ref[k:k + 1, :], vx)
                vy = jnp.where(m, gy_ref[k:k + 1, :], vy)
                vz = jnp.where(m, gz_ref[k:k + 1, :], vz)
        q0 = qo_ref[c, w]
        vs_ref[0, pl.ds(q0, KC), :] = vx
        vs_ref[1, pl.ds(q0, KC), :] = vy
        vs_ref[2, pl.ds(q0, KC), :] = vz
        ls_ref[pl.ds(q0, KC), :] = lane

        @pl.when(w == NW - 1)
        def _():
            own = jnp.sum(gxo_ref[...], axis=0, keepdims=True)
            if mode == "notrans":
                fx = own + vs_ref[0, 0:1, :]
                out_ref[...] = jnp.concatenate(
                    [fx] + [jnp.zeros((1, 128), dtype)] * 7, axis=0)
                return
            vxt = jnp.swapaxes(vs_ref[0], 0, 1)
            vyt = jnp.swapaxes(vs_ref[1], 0, 1)
            vzt = jnp.swapaxes(vs_ref[2], 0, 1)
            lst = jnp.swapaxes(ls_ref[...], 0, 1)
            if mode == "noroute":
                fx = own + vxt[:, 0:1].reshape(1, 128) \
                    + vyt[:, 0:1].reshape(1, 128) \
                    + vzt[:, 0:1].reshape(1, 128) \
                    + lst[:, 0:1].reshape(1, 128).astype(dtype)
                out_ref[...] = jnp.concatenate(
                    [fx] + [jnp.zeros((1, 128), dtype)] * 7, axis=0)
                return
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            zacc = jnp.zeros((128, 128), dtype)

            if mode == "roll8":
                U = 8
                stk0 = jnp.concatenate(
                    [vxt, vyt, vzt,
                     pltpu.bitcast(lst, jnp.float32)], axis=0)  # [512, W]

                def body8(q, carry):
                    ax, ay, az, stk = carry
                    lr = pltpu.bitcast(stk[384:512, :], jnp.int32)
                    for j in range(U):
                        mq = lr[:, j:j + 1] == iota_l
                        ax = ax + jnp.where(mq, stk[0:128, j:j + 1], 0.0)
                        ay = ay + jnp.where(mq, stk[128:256, j:j + 1], 0.0)
                        az = az + jnp.where(mq, stk[256:384, j:j + 1], 0.0)
                    return (ax, ay, az, pltpu.roll(stk, QR + KC - U, 1))

                ax, ay, az, _ = jax.lax.fori_loop(
                    0, (QR + U - 1) // U, body8, (zacc, zacc, zacc, stk0))
            else:
                def body(q, carry):
                    ax, ay, az, vxr, vyr, vzr, lr = carry
                    mq = lr[:, 0:1] == iota_l
                    ax = ax + jnp.where(mq, vxr[:, 0:1], 0.0)
                    ay = ay + jnp.where(mq, vyr[:, 0:1], 0.0)
                    az = az + jnp.where(mq, vzr[:, 0:1], 0.0)
                    s = QR + KC - 1
                    return (ax, ay, az,
                            pltpu.roll(vxr, s, 1), pltpu.roll(vyr, s, 1),
                            pltpu.roll(vzr, s, 1), pltpu.roll(lr, s, 1))

                ax, ay, az, _, _, _, _ = jax.lax.fori_loop(
                    0, QR, body, (zacc, zacc, zacc, vxt, vyt, vzt, lst))
            fx = own - jnp.sum(ax, axis=0, keepdims=True)
            fy = -jnp.sum(ay, axis=0, keepdims=True)
            fz = -jnp.sum(az, axis=0, keepdims=True)
            zrow = jnp.zeros((1, 128), dtype)
            out_ref[...] = jnp.concatenate(
                [fx, fy, fz, zrow, zrow, zrow, zrow, zrow], axis=0)

    return kernel


def run(mode):
    kernel = make_kernel(mode)

    def gblk(c, w, rb, qo):
        return (0, rb[c, w])

    def gown(c, w, rb, qo):
        return (0, c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nch, NW),
        in_specs=[pl.BlockSpec((K, 128), gblk, memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((1, 1, KC, 128), lambda c, w, rb, qo: (c, w, 0, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((K, 128), gown, memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((8, 128), lambda c, w, rb, qo: (0, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, QR + KC, 128), jnp.float32),
            pltpu.VMEM((QR + KC, 128), jnp.int32),
        ],
    )
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
    )(*a))
    out = jax.block_until_ready(
        f(rblocks, qoff, gx, gy, gz, route, gx, gy, gz))
    reps = 30
    t0 = time.time()
    for _ in range(reps):
        out = f(rblocks, qoff, gx, gy, gz, route, gx, gy, gz)
    jax.block_until_ready(out)
    print(f"# {mode}: {(time.time()-t0)/reps*1e3:.2f} ms", flush=True)


np.asarray(jax.device_put(np.ones(8, np.float32)))
print("# warm", flush=True)
def run_production():
    from lammps_plugins_tpu.ops.react_pallas import react_combine
    f = lambda: react_combine(gx, gy, gz, rblocks, qoff, route, QR=QR)
    out = jax.block_until_ready(f())
    reps = 30
    t0 = time.time()
    for _ in range(reps):
        out = f()
    jax.block_until_ready(out)
    print(f"# production split: {(time.time()-t0)/reps*1e3:.2f} ms",
          flush=True)


import sys as _sys
modes = _sys.argv[1:] or ["notrans", "noroute", "nosel", "full"]
for mode in modes:
    if mode == "prod":
        run_production()
    else:
        run(mode)
