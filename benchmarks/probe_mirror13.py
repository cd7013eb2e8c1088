"""Mirror-combine probe 13: materialized packed-plane gathers.

probe_mirror12 found the c64 mirror gather runs 2.75x faster than the
production 3x f32 element gathers — but only PRE-packed (VCP); packing
inside the loop (VC) lost the whole gain because XLA fuses the pack
into the gather and decomposes it back to per-component f32 gathers.
The pack itself is ~31 MB of HBM traffic (~40 us at v5e bandwidth), so
forcing it to materialize should keep the fast gather class:

  V1    3 x f32 element gather                     (production default)
  VCB   c64 pack + optimization_barrier + (c64, f32) gathers
  VCB2  two c64 packs (gx,gy) and (gz,0) + barrier + 2 c64 gathers

(f64/c128 packs are not available: TPU JAX runs without x64 and would
emulate f64 anyway.)  All gathers are exact bit-moves; numerics must
match V1 exactly.

CONCLUSION (v5e, bench-shaped tables): dead end. With the barrier in
place the c64-packed gather runs identical to production (43.89 vs
43.90 ms per 20 iters); probe12's apparent 2.75x VCP win was a probe
artifact — the pre-packed gather was loop-invariant and XLA hoisted it
out of the timing loop. The packed gather lands in the same slow
element-gather class once it actually executes per step. Production
stays on V1 (3x f32 element gathers); the ~10 ms mirror gather remains
the measured XLA floor at this table size (see ARCHITECTURE.md).
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

    def loop(body):
        def run(gx, gy, gz):
            def it(i, carry):
                gx, gy, gz, acc = carry
                f = body(gx, gy, gz)            # [Np,3]
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

    def vcb(gx, gy, gz):
        gxy = lax.optimization_barrier(lax.complex(gx, gy))
        gm = gxy.reshape(-1)[mirT]                  # [K,Np] c64
        gmz = gz.reshape(-1)[mirT] * okT
        ox = jnp.sum(gx, 0) - jnp.sum(jnp.real(gm) * okT, 0)
        oy = jnp.sum(gy, 0) - jnp.sum(jnp.imag(gm) * okT, 0)
        oz = jnp.sum(gz, 0) - jnp.sum(gmz, 0)
        return jnp.stack([ox, oy, oz], -1)

    def vcb2(gx, gy, gz):
        gxy, gz0 = lax.optimization_barrier(
            (lax.complex(gx, gy), lax.complex(gz, jnp.zeros_like(gz))))
        gm = gxy.reshape(-1)[mirT]                  # [K,Np] c64
        gmz = gz0.reshape(-1)[mirT]
        ox = jnp.sum(gx, 0) - jnp.sum(jnp.real(gm) * okT, 0)
        oy = jnp.sum(gy, 0) - jnp.sum(jnp.imag(gm) * okT, 0)
        oz = jnp.sum(gz, 0) - jnp.sum(jnp.real(gmz) * okT, 0)
        return jnp.stack([ox, oy, oz], -1)

    r0 = np.asarray(jax.jit(v1)(gx, gy, gz))
    for nm, v in (("vcb", vcb), ("vcb2", vcb2)):
        r = np.asarray(jax.jit(v)(gx, gy, gz))
        err = np.abs(r - r0).max()
        print(f"# {nm} vs v1 max err {err:.2e}", flush=True)

    timeit("V1   3x f32 elem gather (prod)", loop(v1), (gx, gy, gz))
    timeit("VCB  c64 pack+barrier         ", loop(vcb), (gx, gy, gz))
    timeit("VCB2 2x c64 pack+barrier      ", loop(vcb2), (gx, gy, gz))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1800,), daemon=True).start()
    main()
    os._exit(0)
