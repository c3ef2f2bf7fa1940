"""A/B the tier-geometry mirror adjoint: per-row HBM gather vs single-key
4-array lax.sort (window.MIRROR_IMPL). Parity at 2.6k, timing at 26k.

The mirror-bwd is ~4.3 ms of the angular tier gather's 5.99 ms fwd+bwd at
26k (NOTES_PERF round-4 fresh splits): 716k 3-float rows gathered at the
~4.5 ns/row latency wall. The sort variant replaces the gather with one
dense 4-array sort pass (bandwidth-bound, not per-row latency-bound).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors import window as W
from nnpops_tpu.utils.water import make_water_box


def build(nmol, skin=0.25):
    water = make_water_box(nmol, seed=0)
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                         nn_dtype='bfloat16',
                                         nn_impl='fused')
    model = model.with_blocked_layout(water.positions, water.box,
                                      margin=1.15, impl='window', skin=skin)
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    cl = model.create_cell_list(water.box, skin=skin)
    return model, params, pos, box, cl


def forces(model, params, pos, box, cl):
    sel = model.select(pos, box, cl)
    e, f = model.energy_and_forces_from_selection(params, pos, box, cl, sel)
    return e, f


# ---- parity at 2.6k ----
model, params, pos, box, cl = build(867)
W._make_tier_geometry.cache_clear()
W.MIRROR_IMPL = 'gather'
e_g, f_g = jax.jit(lambda p: forces(model, params, p, box, cl))(pos)
jax.block_until_ready(f_g)
W._make_tier_geometry.cache_clear()
W.MIRROR_IMPL = 'sort'
e_s, f_s = jax.jit(lambda p: forces(model, params, p, box, cl))(pos)
jax.block_until_ready(f_s)
fe = float(jnp.max(jnp.abs(f_s - f_g)) / (jnp.max(jnp.abs(f_g)) + 1e-30))
ee = float(jnp.abs(e_s - e_g) / (jnp.abs(e_g) + 1e-30))
print(f'parity 2.6k: energy rel {ee:.2e}  force max rel {fe:.2e}', flush=True)
assert fe < 1e-5 and ee < 1e-6, 'sort mirror adjoint diverges'


# ---- timing at 26k: full step (select every step folded out via refresh=6
# inner scan, same as bench.py) ----
def timeit(name, fn, arg, steps=12, calls=3):
    run = jax.jit(lambda a: jax.lax.scan(
        lambda c, _: (fn(c), None), a, None, length=steps)[0])
    out = run(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = run(arg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (calls * steps) * 1e3
    print(f'{name}: {dt:.3f} ms/step', flush=True)
    return dt


model, params, pos, box, cl = build(8670)
sel = jax.jit(lambda p: model.select(p, box, cl))(pos)
sel = jax.tree_util.tree_map(jnp.asarray, sel)

for impl in ('gather', 'sort'):
    W._make_tier_geometry.cache_clear()
    W.MIRROR_IMPL = impl

    def frozen_step(p):
        e, f = model.energy_and_forces_from_selection(params, p, box, cl, sel)
        return p + 1e-6 * f

    timeit(f'26k frozen step mirror={impl}', frozen_step, pos)
print('done', flush=True)
