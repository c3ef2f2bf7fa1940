"""Attribute the 26k step's residual glue: ablation timings at the
window_features / _tiered_angular / NN boundaries, frozen selection.

full step  = value_and_grad(window_features -> fused NN -> SAE) + nudge
WF         = window_features alone (AEV fwd / fwd+bwd)
ANG        = _tiered_angular alone (tier gather + part_deltas + kernels +
             perm gather)
radial+glue = WF - ANG  (slot build, stencil window, radial kernels,
             row extract, expand)
step glue  = full - WF(fwd+bwd) - NN(fwd+bwd)
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

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors import window as W
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                     nn_dtype='bfloat16', nn_impl='fused')
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=0.25)
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
cl = model.create_cell_list(water.box, skin=0.25)
sel = jax.jit(lambda p: model.select(p, box, cl))(pos)
sel = jax.tree_util.tree_map(jnp.asarray, sel)
layout = model.blocked_layout
g = model.grouping
ao = jnp.asarray(g.order)


def timeit(name, fn, arg, steps=10, calls=3):
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


def full_step(p):
    e, f = model.energy_and_forces_from_selection(params, p, box, cl, sel)
    return p + 1e-6 * f


def wf(p):
    return W.window_features(cl, p, box, sel, basis, layout, atom_order=ao)


def wf_fwd(p):
    return p + 1e-9 * jnp.sum(wf(p)) * jnp.ones((1, 3))


def wf_fwdbwd(p):
    gr = jax.grad(lambda q: jnp.sum(wf(q) ** 2))(p)
    return p + 1e-9 * gr


ncells = cl.num_cells
if layout.ang_cell_grid is not None and layout.ang_cell_caps is not None:
    cc_a = int(np.prod(layout.ang_cell_grid)) * sum(layout.ang_cell_caps)
else:
    cc_a = ncells * sum(layout.cell_caps)


def ang_only(p):
    _, angular = W._tiered_angular(p, box, sel, basis, layout, cc_a, None)
    return angular


def ang_fwd(p):
    return p + 1e-9 * jnp.sum(ang_only(p)) * jnp.ones((1, 3))


def ang_fwdbwd(p):
    gr = jax.grad(lambda q: jnp.sum(ang_only(q) ** 2))(p)
    return p + 1e-9 * gr


t_full = timeit('full step', full_step, pos)
t_wff = timeit('WF fwd', wf_fwd, pos)
t_wfb = timeit('WF fwd+bwd', wf_fwdbwd, pos)
t_angf = timeit('ANG fwd', ang_fwd, pos)
t_angb = timeit('ANG fwd+bwd', ang_fwdbwd, pos)
print(f'radial+glue fwd  = {t_wff - t_angf:.3f}')
print(f'radial+glue f+b  = {t_wfb - t_angb:.3f}')
print(f'step minus WF(f+b) = {t_full - t_wfb:.3f}  (fused NN + SAE + '
      f'nudge + value_and_grad overhead)')
