"""CFConv production-scale A/B at 26k atoms (VERDICT r4 item 3).

Baseline (round 4): 6-layer periodic build+backprop = 2221.7 ms/it via
plain jax.grad through the rematerialized chunk body (f32 matmuls, XLA
scatter-add input adjoint). This probe splits the cost and measures the
round-5 path: hand-written chunked VJP (self-adjoint input gradient — a
gather, not a scatter) with optional bf16 matmul/gather operands.

Pieces measured:
  payload     — cell-list payload build alone (fwd; shared by all layers)
  fwd[...]    — 6 conv layers forward only, frozen payload
  f+b[...]    — 6 layers + cotangents for (positions-via-payload, x)
  full[...]   — the bench workload: build + 6 layers + value_and_grad
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
from nnpops_tpu.models.schnet import CFConvStack
from nnpops_tpu.neighbors.cell_list import CellList

NATOMS = int(os.environ.get('NATOMS', '26010'))
ITERS = int(os.environ.get('ITERS', '3'))
CHUNK = 2048

cfg = CFConvConfig(width=128, num_gaussians=50, cutoff=10.0,
                   gaussian_width=10.0 / 49)
stack = CFConvStack(cfg, num_layers=6)
params = stack.init(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
side = (NATOMS / 0.1) ** (1 / 3)
box_np = np.diag([side] * 3).astype(np.float32)
pos_np = rng.rand(NATOMS, 3).astype(np.float32) * side
density_cap = int(4 / 3 * np.pi * cfg.cutoff ** 3 * 0.1 * 1.3)
cell_list = CellList.create(box_np, cfg.cutoff, capacity=density_cap)
pos = jnp.asarray(pos_np)
box = jnp.asarray(box_np)
x = jnp.asarray(rng.randn(NATOMS, 128).astype(np.float32))
print(f'N={NATOMS} K={density_cap} cells={cell_list.ncells} '
      f'C={cell_list.cell_capacity}', flush=True)


def timeit(name, fn, *args, iters=ITERS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f'{name}: {dt:.1f} ms/it', flush=True)
    return dt


@jax.jit
def build(p):
    return cell_list.build_payload(p, box)


payload = jax.tree_util.tree_map(jnp.asarray, build(pos))
timeit('payload build (fwd)', build, pos)

for label, kw in (('ad-f32', dict(custom_adjoint=False)),
                  ('cust-f32', dict(custom_adjoint=True)),
                  ('cust-bf16', dict(custom_adjoint=True,
                                     compute_dtype=jnp.bfloat16))):
    @jax.jit
    def fwd(inp, _kw=kw):
        return jnp.sum(stack.apply_payload(params, payload, inp,
                                           chunk_size=CHUNK, **_kw))

    @jax.jit
    def fb(inp, _kw=kw):
        def tot(p, i):
            pl = cell_list.build_payload(p, box)
            return jnp.sum(stack.apply_payload(params, pl, i,
                                               chunk_size=CHUNK, **_kw))
        return jax.value_and_grad(tot, argnums=(0, 1))(pos, inp)

    try:
        timeit(f'fwd [{label}] (frozen payload, 6 layers)', fwd, x)
        timeit(f'full [{label}] (build + 6 layers + grad)', fb, x)
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:2])[:300]
        print(f'{label}: FAILED {type(e).__name__}: {msg}', flush=True)


# Round-5 chain: mirror select + scatter-free distance payload + hand VJP.
@jax.jit
def full_r5(inp):
    def tot(p, i):
        sel = cell_list.select(p, box, build_mirror=True)
        d, idx, m = cell_list.payload_distances_from_selection(p, box, sel)
        return jnp.sum(stack.apply_distances(params, d, idx, m, i,
                                             chunk_size=CHUNK))
    return jax.value_and_grad(tot, argnums=(0, 1))(pos, inp)


timeit('full [r5 mirror+dist] (build + 6 layers + grad)', full_r5, x)


# True neighbor-count headroom: K is sized by density*1.3; if the true max
# is well below, the cap (and with it every per-lane cost) can tighten.
print('true max neighbors:', int(payload.max_neighbors),
      'capacity:', density_cap, flush=True)
