"""Production fused-NN path decomposition at 26k rows.

Times (fwd and grad):
  h-only     — species_energies_fused on a pre-sliced exact-multiple H block
  o-only     — same for the O block
  grouped    — the full ensemble_energy_grouped_rows_fused path (slices +
               padding + both nets): the delta vs h+o is the XLA glue.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)

from nnpops_tpu.config import ANI2X_LAYER_DIMS
from nnpops_tpu.ops.batched_nn import build_grouping, init_ensemble
from nnpops_tpu.ops.pallas_nn import (ensemble_energy_grouped_rows_fused,
                                      species_energies_fused)

N = 26010
NH = 17408   # exact multiple of 256
NO = N - NH
species = np.array([0] * NO + [1] * NH, np.int32)
g = build_grouping(species, 2)
ens = init_ensemble(jax.random.PRNGKey(0), 1008, ANI2X_LAYER_DIMS[:2], 8)
x = jax.random.normal(jax.random.PRNGKey(1), (N, 1008)) * 0.3
xh = x[:NH]
xo = x[:NO]


def timeit(name, fn, arg, steps=10, calls=3):
    run = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (c + 1e-9 * fn(c), None), a, None, length=steps)[0])
    out = run(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = run(arg)
    jax.block_until_ready(out)
    print(f'{name}: {(time.perf_counter() - t0) / (calls * steps) * 1e3:.3f}'
          ' ms/call', flush=True)


def h_fwd(a):
    return jnp.sum(species_energies_fused(ens.networks[1], a))


def o_fwd(a):
    return jnp.sum(species_energies_fused(ens.networks[0], a))


def grouped_fwd(a):
    return ensemble_energy_grouped_rows_fused(ens, a, g.counts)


timeit('h-only fwd', h_fwd, xh)
timeit('o-only fwd', o_fwd, xo)
timeit('grouped fwd', grouped_fwd, x)
timeit('h-only grad', lambda a: jnp.sum(jax.grad(h_fwd)(a)), xh)
timeit('o-only grad', lambda a: jnp.sum(jax.grad(o_fwd)(a)), xo)
timeit('grouped grad', lambda a: jnp.sum(jax.grad(grouped_fwd)(a)), x)
print('done', flush=True)
