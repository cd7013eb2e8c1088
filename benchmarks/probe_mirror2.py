"""Mirror-combine round 2: row gathers from a FORCED row-major [E,3] source.

V4: source passed in already row-major (pure gather cost, k-major indices)
V5: source built in-jit from gx/gy/gz with with_layout_constraint (stack +
    forced relayout + gather) — the production-shaped pipeline
V6: like V5 but n-major index order (locality test)
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
    jax.block_until_ready(fn(*args))
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
    from jax.experimental.layout import Layout, Format, with_layout_constraint

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

    mir = np.asarray(rebo.mirror)
    ok = np.asarray(rebo.mask) & (mir >= 0)
    mir_i = np.where(ok, mir // K, 0)
    mir_k = np.where(ok, mir % K, 0)
    mirT = jnp.asarray(np.pad((mir_k * Np + mir_i).T.astype(np.int32),
                              ((0, 0), (0, Np - N))))
    okT = jnp.asarray(np.pad(ok.T.astype(np.float32),
                             ((0, 0), (0, Np - N))))
    mirN = jnp.asarray(np.pad((mir_i * K + mir_k).astype(np.int32),
                              ((0, Np - N), (0, 0))))
    okN = jnp.asarray(np.pad(ok.astype(np.float32), ((0, Np - N), (0, 0))))

    key = jax.random.PRNGKey(0)
    gx, gy, gz = (jax.random.normal(k, (K, Np), jnp.float32)
                  for k in jax.random.split(key, 3))
    gx, gy, gz = map(jax.block_until_ready, (gx, gy, gz))
    G_rows = jax.block_until_ready(
        jnp.asarray(np.stack([np.asarray(gx).reshape(-1),
                              np.asarray(gy).reshape(-1),
                              np.asarray(gz).reshape(-1)], axis=-1)))

    dev_shard = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def loop3(body):
        def run(gx, gy, gz):
            def it(i, carry):
                gx, gy, gz, acc = carry
                f = body(gx, gy, gz)
                s = jnp.sum(f[0]) * 1e-20
                return (gx + s, gy + s, gz + s, acc + f)
            z = jnp.zeros((Np, 3), jnp.float32)
            return lax.fori_loop(0, ITERS, it, (gx, gy, gz, z))[3]
        return jax.jit(run)

    def loop1(body):
        def run(G):
            def it(i, carry):
                G, acc = carry
                f = body(G)
                s = jnp.sum(f[0]) * 1e-20
                return (G + s, acc + f)
            z = jnp.zeros((Np, 3), jnp.float32)
            return lax.fori_loop(0, ITERS, it, (G, z))[1]
        return jax.jit(run)

    def v4(G):                                   # pure gather, k-major idx
        gm = G[mirT.reshape(-1)].reshape(K, Np, 3) * okT[..., None]
        return jnp.sum(G.reshape(K, Np, 3), 0) - jnp.sum(gm, 0)

    def v5(gx, gy, gz):
        G = jnp.stack([gx, gy, gz], axis=-1)     # [K,Np,3]
        G = with_layout_constraint(G, Layout((0, 1, 2)))
        Gf = G.reshape(K * Np, 3)
        gm = Gf[mirT.reshape(-1)].reshape(K, Np, 3) * okT[..., None]
        return jnp.sum(G, 0) - jnp.sum(gm, 0)

    def v6(gx, gy, gz):
        G = jnp.stack([gx, gy, gz], axis=-1)
        GT = jnp.swapaxes(G, 0, 1)               # [Np,K,3]
        GT = with_layout_constraint(GT, Layout((0, 1, 2)))
        gm = GT.reshape(Np * K, 3)[mirN.reshape(-1)].reshape(Np, K, 3)
        gm = gm * okN[..., None]
        return jnp.sum(G, 0) - jnp.sum(gm, 1)

    r4 = np.asarray(jax.jit(v4)(G_rows))
    r5 = np.asarray(jax.jit(v5)(gx, gy, gz))
    r6 = np.asarray(jax.jit(v6)(gx, gy, gz))
    print(f"# v5 vs v4 max err {np.abs(r5-r4).max():.2e}", flush=True)
    print(f"# v6 vs v4 max err {np.abs(r6-r4).max():.2e}", flush=True)

    timeit("V4 pure row gather (k-major idx)   ", loop1(v4), (G_rows,))
    timeit("V5 stack+layout-forced+gather kmaj ", loop3(v5), (gx, gy, gz))
    timeit("V6 transpose+layout-forced nmaj    ", loop3(v6), (gx, gy, gz))


if __name__ == "__main__":
    threading.Thread(target=_watchdog, args=(1500,), daemon=True).start()
    main()
    os._exit(0)
