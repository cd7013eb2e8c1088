"""TPU smoke + standalone timing for the block-sparse reaction kernel.

Compiles ops/react_pallas.react_combine at bench-scale shapes with
synthetic-but-realistic route tables (built from the real 98k scene's
neighbor list via build_route_tables) and times it standalone.  The
end-to-end number is bench.py's; this probe only answers "does the
kernel compile on the real chip and what is its isolated cost".
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
from lammps_plugins_tpu.potentials.rebomos import REBOMoS
from lammps_plugins_tpu.neighbor.build import build_neighbor_data
from lammps_plugins_tpu.neighbor.neighbor import mirror_combine, NeighborList
from lammps_plugins_tpu.ops.react_pallas import (build_route_tables,
                                                 react_combine)

t0 = time.time()
state = rebomos_bulk_commensurate(nx=34, ny=48, nz=10, dtype=jnp.float32)
pair = REBOMoS.from_file(
    "/root/reference/USER-REBOMOS/MoS.REBO.set5b", ["M", "S"],
    dtype=jnp.float32)
x = np.asarray(state.x)
n = x.shape[0]
nbr = build_neighbor_data(x, np.asarray(state.type), state.box,
                          pair.neighbor_requests(), skin=1.0,
                          dtype=jnp.float32)
rebo = nbr.lists["rebo"]
K = rebo.idx.shape[1]
Np = -(-n // 128) * 128
print(f"# scene+host build {time.time()-t0:.1f}s n={n} K={K}", flush=True)

# host-side mirror resolution is not in build_neighbor_data's host list;
# use target-validity = mask (every masked edge participates) — for the
# kernel-parity/timing purpose the mirror table can be the mask itself
mir = jnp.where(rebo.mask, jnp.zeros_like(rebo.idx), -1)

t0 = time.time()
out = build_route_tables(rebo.idx, rebo.mask, mir, nbr.ghosts.owner,
                         n, K, 0, 0)
nw_n, kc_n, rq_n = int(out[3]), int(out[4]), int(out[5])
print(f"# counts ({time.time()-t0:.1f}s): nw={nw_n} kc={kc_n} rq={rq_n}",
      flush=True)
NW = -(-nw_n // 4) * 4 + 4
KC = -(-kc_n // 2) * 2 + 2
QR = -(-rq_n // 16) * 16 + 16

t0 = time.time()
rblocks, qoff, route, *_ = jax.block_until_ready(build_route_tables(
    rebo.idx, rebo.mask, mir, nbr.ghosts.owner, n, K, NW, KC, QR))
print(f"# route build (incl compile) {time.time()-t0:.1f}s "
      f"NW={NW} KC={KC} QR={QR}", flush=True)
t0 = time.time()
jax.block_until_ready(build_route_tables(
    rebo.idx, rebo.mask, mir, nbr.ghosts.owner, n, K, NW, KC, QR))
print(f"# route build warm: {(time.time()-t0)*1e3:.1f} ms", flush=True)

rng = np.random.default_rng(3)
g = (rng.normal(size=(3, K, Np)).astype(np.float32)
     * np.pad(np.asarray(rebo.mask), ((0, 0), (0, Np - n))).T[None])
gx, gy, gz = (jnp.asarray(g[i]) for i in range(3))

t0 = time.time()
F = jax.block_until_ready(react_combine(gx, gy, gz, rblocks, qoff, route,
                                        QR=QR))
print(f"# kernel compile+run {time.time()-t0:.1f}s", flush=True)

# parity vs the XLA mirror... mirror table isn't real here; check only
# own-sum + routed-sum conservation: sum of F over atoms should equal
# own-sum total minus total routed = 0 when every edge routes
tot = np.asarray(jnp.sum(F[:n], axis=0))
own = np.asarray(jnp.sum(gx[:, :n]) if False else 0)
print(f"# force sum (should be ~0): {tot}", flush=True)

reps = 30
t0 = time.time()
for _ in range(reps):
    F = react_combine(gx, gy, gz, rblocks, qoff, route, QR=QR)
jax.block_until_ready(F)
dt = (time.time() - t0) / reps
print(f"# react_combine standalone: {dt*1e3:.2f} ms/call", flush=True)

# reference: the XLA mirror gather standalone at the same shapes
mirT = jnp.asarray(
    rng.integers(0, K * Np, size=(K, Np), dtype=np.int32))
mirvT = jnp.ones((K, Np), jnp.float32)


@jax.jit
def mirror_gather(gx, gy, gz, mirT, mirvT):
    grows = jnp.stack([gx, gy, gz], axis=-1).reshape(K * Np, 3)
    gmir = grows[mirT.reshape(-1)].reshape(K, Np, 3) * mirvT[..., None]
    return (jnp.sum(jnp.stack([gx, gy, gz], axis=-1), axis=0)
            - jnp.sum(gmir, axis=0))


Fm = jax.block_until_ready(mirror_gather(gx, gy, gz, mirT, mirvT))
t0 = time.time()
for _ in range(reps):
    Fm = mirror_gather(gx, gy, gz, mirT, mirvT)
jax.block_until_ready(Fm)
dt = (time.time() - t0) / reps
print(f"# mirror gather standalone: {dt*1e3:.2f} ms/call", flush=True)
