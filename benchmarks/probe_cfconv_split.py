"""Per-piece attribution of the 26k CFConv step (round 5).

Pieces, all at N=26010, K=544, W=128, G=50, chunk 2048, single layer
unless noted:
  select          — CellList.select (the [N, 27C] candidate + wide sort)
  payload fwd     — payload_from_selection (frozen selection)
  payload f+b     — + VJP with a given [N, K] distance cotangent (isolates
                    the 14M-row slots-gather scatter transpose)
  filters fwd     — chunked filter pipeline only (no neighbor-input gather)
  layer fwd       — one conv layer (filters + x-gather + weighted sum)
  layer f+b       — one conv layer custom VJP (frozen payload)
Variants: f32 vs bf16 matmul operands.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

print('devices:', jax.devices(), flush=True)

from nnpops_tpu.config import CFConvConfig
from nnpops_tpu.neighbors.cell_list import CellList
import importlib

CF = importlib.import_module('nnpops_tpu.ops.cfconv')

NATOMS = int(os.environ.get('NATOMS', '26010'))
CHUNK = 2048
cfg = CFConvConfig(width=128, num_gaussians=50, cutoff=10.0,
                   gaussian_width=10.0 / 49)
params = CF.init_cfconv(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
side = (NATOMS / 0.1) ** (1 / 3)
box_np = np.diag([side] * 3).astype(np.float32)
pos = jnp.asarray(rng.rand(NATOMS, 3).astype(np.float32) * side)
box = jnp.asarray(box_np)
cap = int(4 / 3 * np.pi * cfg.cutoff ** 3 * 0.1 * 1.3)
cl = CellList.create(box_np, cfg.cutoff, capacity=cap)
x = jnp.asarray(rng.randn(NATOMS, 128).astype(np.float32))
g = jnp.asarray(rng.randn(NATOMS, 128).astype(np.float32))
gd = jnp.asarray(rng.randn(NATOMS, cap).astype(np.float32))


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f'{name}: {dt:.1f} ms/it', flush=True)
    return dt


sel = jax.jit(lambda p: cl.select(p, box))(pos)
sel = jax.tree_util.tree_map(jnp.asarray, sel)

timeit('select', jax.jit(lambda p: cl.select(p, box).nbr_slot_k), pos)
timeit('payload fwd', jax.jit(
    lambda p: cl.payload_from_selection(p, box, sel).distances), pos)
timeit('payload f+b', jax.jit(lambda p: jax.grad(
    lambda q: jnp.sum(cl.payload_from_selection(q, box, sel).distances
                      * gd))(p)), pos)

payload = jax.jit(lambda p: cl.payload_from_selection(p, box, sel))(pos)
payload = jax.tree_util.tree_map(jnp.asarray, payload)
mask = payload.mask & (payload.distances < cfg.cutoff)
dist = jnp.where(mask, payload.distances, 0.0)
idx = jnp.where(mask, payload.indices, NATOMS)

for dt_name in (None, 'bfloat16'):
    tag = dt_name or 'f32'
    conv = CF._make_payload_conv(cfg, CHUNK, dt_name)

    # filters-only: reuse pair_filters (same math) chunked via lax.map
    def filt(d, m):
        n, k = d.shape
        pad = (-n) % CHUNK
        nb = (n + pad) // CHUNK
        dd = jnp.concatenate([d, jnp.zeros((pad, k), d.dtype)]).reshape(
            nb, CHUNK, k)
        mm = jnp.concatenate([m, jnp.zeros((pad, k), bool)]).reshape(
            nb, CHUNK, k)
        out = jax.lax.map(
            lambda a: jnp.sum(CF.pair_filters(params, a[0], a[1], cfg),
                              axis=(1, 2)), (dd, mm))
        return out.reshape(-1)[:n]

    if dt_name is None:
        timeit('filters fwd [f32 pair_filters]', jax.jit(filt), dist, mask)

    timeit(f'layer fwd [{tag}]',
           jax.jit(lambda d, xx: conv(params, d, mask, idx, xx)), dist, x)

    def layer_fb(d, xx):
        def loss(dd, xi):
            return jnp.sum(conv(params, dd, mask, idx, xi) * g)
        return jax.grad(loss, argnums=(0, 1))(d, xx)

    timeit(f'layer f+b [{tag}]', jax.jit(layer_fb), dist, x)
