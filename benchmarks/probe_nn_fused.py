"""Fused Pallas ensemble NN vs XLA bf16 path at 26k rows (fwd+bwd)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)

from nnpops_tpu.config import ANI2X_LAYER_DIMS
from nnpops_tpu.ops.batched_nn import (build_grouping,
                                       ensemble_energy_grouped_rows,
                                       init_ensemble)
from nnpops_tpu.ops.pallas_nn import ensemble_energy_grouped_rows_fused

N = int(os.environ.get('N', '26010'))
species = np.array([1] * (N // 3) + [0] * (N - N // 3), np.int32)
species.sort()
g = build_grouping(species, 2)
ens = init_ensemble(jax.random.PRNGKey(0), 1008, ANI2X_LAYER_DIMS[:2], 8)
x = jax.random.normal(jax.random.PRNGKey(1), (N, 1008)) * 0.3


def timeit(name, fn, steps=6, calls=2):
    run = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (c + 1e-9 * fn(c), None), x, None, length=steps)[0])
    out = run(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = run(x)
    jax.block_until_ready(out)
    print(f'{name}: {(time.perf_counter() - t0) / (calls * steps) * 1e3:.3f}'
          ' ms/call', flush=True)


def fwdbwd_fused(x):
    return jax.grad(lambda x: ensemble_energy_grouped_rows_fused(
        ens, x, g.counts))(x)


def fwdbwd_xla(x):
    return jax.grad(lambda x: ensemble_energy_grouped_rows(
        ens, x, g.counts, jnp.bfloat16))(x)


def fwd_fused(x):
    return jnp.ones((N, 1008)) * ensemble_energy_grouped_rows_fused(
        ens, x, g.counts)


timeit('fused fwd only', fwd_fused)
timeit('fused fwd+bwd', fwdbwd_fused)
timeit('xla bf16 fwd+bwd', fwdbwd_xla)
print('done', flush=True)
