"""A/B the radial slot-plane stencil window: [ncells, 27] row gather with
gather-based custom adjoint vs 27 periodic jnp.rolls (window.STENCIL_IMPL).
Parity at 2.6k, frozen-step timing at 26k.

The roll variant exploits that the stencil IS a periodic 3D shift: window
entry e is roll(planes, -off_e) on the cell grid — dense slice-concats in
BOTH directions (roll's transpose is the opposite roll), so the radial bwd
glue loses its scatter/gather entirely.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
W._make_stencil_window_impl.cache_clear()
W.STENCIL_IMPL = 'gather'
e_g, f_g = jax.jit(lambda p: forces(model, params, p, box, cl))(pos)
jax.block_until_ready(f_g)
W._make_stencil_window_impl.cache_clear()
W.STENCIL_IMPL = 'roll'
e_r, f_r = jax.jit(lambda p: forces(model, params, p, box, cl))(pos)
jax.block_until_ready(f_r)
fe = float(jnp.max(jnp.abs(f_r - f_g)) / (jnp.max(jnp.abs(f_g)) + 1e-30))
ee = float(jnp.abs(e_r - e_g) / (jnp.abs(e_g) + 1e-30))
print(f'parity 2.6k: energy rel {ee:.2e}  force max rel {fe:.2e}', flush=True)
assert fe < 1e-5 and ee < 1e-6, 'roll stencil diverges'


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

for impl in ('gather', 'roll'):
    W._make_stencil_window_impl.cache_clear()
    W.STENCIL_IMPL = impl

    def frozen_step(p):
        e, f = model.energy_and_forces_from_selection(params, p, box, cl, sel)
        return p + 1e-6 * f

    timeit(f'26k frozen step stencil={impl}', frozen_step, pos)
print('done', flush=True)
