"""Bisect the round-2 session-6 changes at 26k: pair vs window radial
kernel (frozen-step scan) and dual- vs single-grid select."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses
import jax, numpy as np
import jax.numpy as jnp
from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.utils.water import make_water_box

def timeit(fn, *a, iters=3, warm=1):
    for _ in range(warm):
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

water = make_water_box(8670, seed=0)
basis = ANIBasis.ani2x()
base = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                    nn_dtype='bfloat16', nn_impl='fused')
skin = 0.25
m = base.with_blocked_layout(water.positions, water.box, margin=1.15,
                             impl='window', skin=skin)
print('rad grid', m.blocked_layout.cell_grid, m.blocked_layout.cell_caps)
print('ang grid', m.blocked_layout.ang_cell_grid, m.blocked_layout.ang_cell_caps)
params = init_ani_params(jax.random.PRNGKey(0), basis)
cl = m.create_cell_list(water.box, skin=skin)
box = jnp.asarray(water.box); pos = jnp.asarray(water.positions)

mw = dataclasses.replace(m, window_radial='window')

# select cost (all outputs forced)
@jax.jit
def sel_full(p):
    s = m.select(p, box, cl)
    return jax.tree.map(lambda x: (jnp.sum(x) if jnp.issubdtype(x.dtype, jnp.floating) else jnp.sum(x.astype(jnp.int32))) if hasattr(x, 'dtype') else x, s)
print('select dual-grid FULL: %.2f ms' % timeit(sel_full, pos), flush=True)

sel = m.select(pos, box, cl)
sel = jax.tree.map(lambda x: x, sel)
selw = mw.select(pos, box, cl)

def frozen(model, s):
    @jax.jit
    def run(params, p):
        def step(p, _):
            e, f = model.energy_and_forces_from_selection(params, p, box, cl, s)
            return p + 1e-6 * f, e
        return jax.lax.scan(step, p, None, length=10)
    r = run(params, pos); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(params, pos); jax.block_until_ready(r)
    r = run(params, pos); jax.block_until_ready(r)
    return (time.perf_counter() - t0) / 20 * 1e3

print('frozen step PAIR radial: %.2f ms' % frozen(m, sel), flush=True)
print('frozen step WINDOW radial: %.2f ms' % frozen(mw, selw), flush=True)
