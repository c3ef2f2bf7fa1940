"""A/B the fused Pallas CFConv backward at 26k (capacity 640 = 5 x 128
lanes for the kernel's lane tiling; the XLA path at 640 isolates the
capacity tax vs the kernel gain)."""
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
CHUNK = 2048
CAP = int(os.environ.get('CAP', '640'))

cfg = CFConvConfig(width=128, num_gaussians=50, cutoff=10.0,
                   gaussian_width=10.0 / 49)
stack = CFConvStack(cfg, num_layers=6)
params = stack.init(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
side = (NATOMS / 0.1) ** (1 / 3)
box_np = np.diag([side] * 3).astype(np.float32)
pos = jnp.asarray(rng.rand(NATOMS, 3).astype(np.float32) * side)
box = jnp.asarray(box_np)
cl = CellList.create(box_np, cfg.cutoff, capacity=CAP)
x = jnp.asarray(rng.randn(NATOMS, 128).astype(np.float32))
print(f'N={NATOMS} K={CAP} C={cl.cell_capacity}', flush=True)


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


for impl in ('xla', 'pallas'):
    @jax.jit
    def full(inp, _impl=impl):
        def tot(p, i):
            sel = cl.select(p, box, build_mirror=True)
            d, idx, m = cl.payload_distances_from_selection(p, box, sel)
            out = i
            from nnpops_tpu.ops.cfconv import cfconv_masked
            for prm in params:
                out = cfconv_masked(prm, d, m, idx, out, cfg,
                                    chunk_size=CHUNK, bwd_impl=_impl)
            return jnp.sum(out)
        return jax.value_and_grad(tot, argnums=(0, 1))(pos, inp)

    try:
        timeit(f'full cap{CAP} [{impl}] (build + 6 layers + grad)', full, x)
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:3])[:400]
        print(f'{impl}: FAILED {type(e).__name__}: {msg}', flush=True)
