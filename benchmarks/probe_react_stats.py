"""Host-side geometry stats for the block-sparse reaction kernel.

For the 98k-atom bench scene, measures over the REBO tier's directed
edges (i -> j, target owner t = owner(j)):
  * NW: per 128-atom target chunk, how many distinct 128-column source
    blocks contain at least one incoming edge (drives the kernel grid).
  * KC: max number of edges from one source column into one target chunk
    (drives the route-table depth).
  * q: per chunk, sum over marked blocks of that block's max per-column
    multiplicity (the packed route-row count).

Pure numpy on the host neighbor build — no device.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from lammps_plugins_tpu.api.scenes import rebomos_bulk_commensurate
from lammps_plugins_tpu.potentials.rebomos import REBOMoS
from lammps_plugins_tpu.neighbor.build import build_neighbor_data

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
idx = np.asarray(rebo.idx)
mask = np.asarray(rebo.mask)
owner = np.asarray(nbr.ghosts.owner)
K = idx.shape[1]
Np = -(-n // 128) * 128
nch = Np // 128
print(f"n={n} K={K} Np={Np} chunks={nch} edges={int(mask.sum())}")

otgt = np.where(idx < n, idx, owner[np.clip(idx - n, 0, None)])
src = np.broadcast_to(np.arange(n)[:, None], idx.shape)
c = otgt // 128        # target chunk
b = src // 128         # source block

cv, bv, sv, ov = c[mask], b[mask], src[mask], otgt[mask]

# NW: distinct source blocks per target chunk
pairs_cb = np.unique(cv.astype(np.int64) * nch + bv)
per_chunk_nw = np.bincount((pairs_cb // nch).astype(np.int64), minlength=nch)
print(f"NW: max={per_chunk_nw.max()} p99={np.percentile(per_chunk_nw, 99):.0f}"
      f" mean={per_chunk_nw.mean():.1f}")

# KC: multiplicity of (target chunk, source column)
key_cj = cv.astype(np.int64) * n + sv
_, counts = np.unique(key_cj, return_counts=True)
print(f"KC: max={counts.max()} p99.9={np.percentile(counts, 99.9):.0f}"
      f" mean={counts.mean():.2f}"
      f" hist={np.bincount(counts)[1:].tolist()}")

# packed q rows: per (chunk, block), max per-column multiplicity; sum over
# blocks of chunk
key_cbj = (cv.astype(np.int64) * nch + bv) * 128 + (sv % 128)
ucbj, ccbj = np.unique(key_cbj, return_counts=True)
ucb = ucbj // 128
# max multiplicity per (c,b)
order = np.argsort(ucb, kind="stable")
ucb_s, ccbj_s = ucb[order], ccbj[order]
bounds = np.searchsorted(ucb_s, np.unique(ucb_s))
maxmult = np.maximum.reduceat(ccbj_s, bounds)
qc = np.bincount((np.unique(ucb_s) // nch).astype(np.int64),
                 weights=maxmult.astype(np.float64), minlength=nch)
print(f"q rows (packed): max={qc.max():.0f} p99={np.percentile(qc, 99):.0f}"
      f" mean={qc.mean():.1f}  (static NW*KC would be"
      f" {per_chunk_nw.max()}*{counts.max()})")

# sanity: total incoming edges per chunk
inc = np.bincount(cv, minlength=nch)
print(f"incoming edges/chunk: max={inc.max()} mean={inc.mean():.0f}")
