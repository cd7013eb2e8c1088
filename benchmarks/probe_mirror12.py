"""Mirror-combine probe 12: pack two cotangent planes per gather element.

The production mirror combine is three independent [K,Np] f32 element
gathers (~3.4 ms each at the 98k bench size; probe_mirror.py V1).  The
element-gather cost is per ELEMENT (transaction-granularity-bound), so
packing two f32 planes into one complex64 plane should gather the same
bytes in 2/3 the elements:

  V1   3 x f32 element gather                       (production)
  VC   complex64(gx,gy) gather + f32 gz gather, pack INSIDE the loop
       (real cost: the pack is an extra elementwise pass over 2 planes)
  VCP  same but pack outside the loop (gather-only upper bound)

If VC wins, the production fusion packs the kernel's gx,gy outputs once
per step and splits after the combine.
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _watchdog(seconds):
    time.sleep(seconds)
    print("# watchdog: clean exit", flush=True)
    os._exit(0)


ITERS = 20


def timeit(name, fn, args, reps=3):
    import jax
    jax.block_until_ready(fn(*args))        # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1e3 / ITERS:8.2f} ms/iter", flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    np.asarray(jax.device_put(np.ones(8, np.float32)))
    print("# warmed", flush=True)

    from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
    from lammps_plugins_tpu.core import units
    from lammps_plugins_tpu.fixes.nve import FixNVE
    from lammps_plugins_tpu.fixes.velocity import velocity_create
    from lammps_plugins_tpu.potentials.rebomos import REBOMoS
    from lammps_plugins_tpu.run.simulation import Engine

    state = rebomos_bulk_commensurate(nx=34, ny=48, nz=10, dtype=jnp.float32)
    pair = REBOMoS.from_file(
        "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
        dtype=jnp.float32)
    state = velocity_create(state, units.METAL, 300.0, seed=12345)
    eng = Engine(state, pair, [FixNVE()], units.METAL, skin=1.0)
    eng.rebuild_neighbors()
    rebo = eng.nbr.lists["rebo"]
    N, K = rebo.idx.shape
    Np = -(-N // 128) * 128
    print(f"# N={N} K={K} Np={Np}", flush=True)

    mir = np.asarray(rebo.mirror)           # [N,K], n-major flat (i*K+k)
    ok = np.asarray(rebo.mask) & (mir >= 0)
    mir_i = np.where(ok, mir // K, 0)
    mir_k = np.where(ok, mir % K, 0)

    mirT = jnp.asarray(np.pad((mir_k * Np + mir_i).T.astype(np.int32),
                              ((0, 0), (0, Np - N))))
    okT = jnp.asarray(np.pad(ok.T.astype(np.float32),
                             ((0, 0), (0, Np - N))))

    key = jax.random.PRNGKey(0)
    gx, gy, gz = (jax.random.normal(k, (K, Np), jnp.float32)
                  for k in jax.random.split(key, 3))
    gx, gy, gz = map(jax.block_until_ready, (gx, gy, gz))
    gxy0 = jax.block_until_ready(jax.jit(lax.complex)(gx, gy))

    def loop(body, extra=()):
        def run(gx, gy, gz, *ex):
            def it(i, carry):
                gx, gy, gz, acc = carry
                f = body(gx, gy, gz, *ex)       # [Np,3]
                s = jnp.sum(f[0]) * 1e-20
                return (gx + s, gy + s, gz + s, acc + f)
            z = jnp.zeros((Np, 3), jnp.float32)
            return lax.fori_loop(0, ITERS, it, (gx, gy, gz, z))[3]
        return jax.jit(run)

    def v1(gx, gy, gz):
        outs = []
        for g in (gx, gy, gz):
            gm = g.reshape(-1)[mirT] * okT          # [K,Np]
            outs.append(jnp.sum(g, 0) - jnp.sum(gm, 0))
        return jnp.stack(outs, -1)

    def vc(gx, gy, gz):
        gxy = lax.complex(gx, gy)                   # pack cost included
        gm = gxy.reshape(-1)[mirT]                  # [K,Np] c64
        gmz = gz.reshape(-1)[mirT] * okT
        ox = jnp.sum(gx, 0) - jnp.sum(jnp.real(gm) * okT, 0)
        oy = jnp.sum(gy, 0) - jnp.sum(jnp.imag(gm) * okT, 0)
        oz = jnp.sum(gz, 0) - jnp.sum(gmz, 0)
        return jnp.stack([ox, oy, oz], -1)

    def vcp(gx, gy, gz, gxy):
        gm = gxy.reshape(-1)[mirT]
        gmz = gz.reshape(-1)[mirT] * okT
        ox = jnp.sum(gx, 0) - jnp.sum(jnp.real(gm) * okT, 0)
        oy = jnp.sum(gy, 0) - jnp.sum(jnp.imag(gm) * okT, 0)
        oz = jnp.sum(gz, 0) - jnp.sum(gmz, 0)
        return jnp.stack([ox, oy, oz], -1)

    r0 = np.asarray(jax.jit(v1)(gx, gy, gz))
    for nm, v, ex in (("vc", vc, ()), ("vcp", vcp, (gxy0,))):
        r = np.asarray(jax.jit(v)(gx, gy, gz, *ex))
        err = np.abs(r - r0).max()
        print(f"# {nm} vs v1 max err {err:.2e}", flush=True)

    timeit("V1  3x f32 elem gather (prod)", loop(v1), (gx, gy, gz))
    timeit("VC  c64 pack-in-loop + f32   ", loop(vc), (gx, gy, gz))
    timeit("VCP c64 pre-packed + f32     ", loop(vcp), (gx, gy, gz, gxy0))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(900,), daemon=True).start()
    main()
    os._exit(0)
