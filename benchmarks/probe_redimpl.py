"""A/B the angular kernel's fractional-pow implementation on production
26k tier shapes: 'split' (integer mults + jnp.exp/log fractional factor)
vs 'fast' (integer mults + dyadic exp2/log2 fractional factor). Reports
per-tier fwd / fwd+bwd ms and max |diff| vs 'split'."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
import numpy as np

from tpu_timing import slope_ms

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel
from nnpops_tpu.neighbors.window import (_part_deltas, _tiered_gather,
                                         tier_layouts, tier_bwd_impl)
from nnpops_tpu.ops.pallas_aev import angular_aev_pallas
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))

water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                     nn_dtype=jnp.bfloat16, nn_impl='fused')
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
clist = model.create_cell_list(water.box, skin=SKIN)
sel = jax.jit(lambda p: model.select(p, box, clist))(pos)
jax.block_until_ready(sel.ang.order)
layout = model.blocked_layout
t = sel.tier
cc_a = (int(np.prod(layout.ang_cell_grid)) * sum(layout.ang_cell_caps)
        if layout.ang_cell_grid is not None
        else clist.num_cells * sum(layout.cell_caps))
caps_all = (layout.ang_caps,) + tuple(layout.ang_tier_caps)
lays = tier_layouts(layout)
ntiers = len(lays)
print('ntiers', ntiers, 'caps', caps_all, flush=True)


def make_deltas(p):
    ps = p[sel.ang.order]
    slots = jnp.zeros((cc_a + 2, 3), p.dtype)
    slots = slots.at[sel.ang.slot_of_sorted].set(ps, mode='drop')
    outs = _tiered_gather(slots, t.idx, t.mir, t.mask, t.slot_rows)
    ctrs = [slots[jnp.minimum(sr, cc_a + 1)] for sr in t.slot_rows]
    return tuple(_part_deltas(outs[i], ctrs[i], t.mask[i], box)
                 for i in range(ntiers))


ds = jax.jit(make_deltas)(pos)
jax.block_until_ready(ds[0])
print('tier shapes:', [d.shape for d in ds], flush=True)

results = {}
for impl in ('slice', 'mask'):
    outs, grads = [], []
    for ti in range(ntiers):
        def k(d, ti=ti, impl=impl):
            return angular_aev_pallas(
                d, t.mask[ti], basis, lays[ti], rad_width=d.shape[2],
                bwd_impl=tier_bwd_impl(caps_all[ti]), red_impl=impl)
        outs.append(np.asarray(jax.jit(k)(ds[ti])))
        grads.append(np.asarray(jax.jit(jax.grad(
            lambda d: jnp.sum(k(d) ** 2)))(ds[ti])))
        print(f'{impl} tier{ti} fwd: '
              f'{slope_ms(jax.jit(k), (ds[ti],)):.3f} ms', flush=True)
        fb = jax.jit(jax.grad(lambda d, k=k: jnp.sum(k(d) ** 2)))
        print(f'{impl} tier{ti} fwd+bwd: '
              f'{slope_ms(fb, (ds[ti],)):.3f} ms', flush=True)
    results[impl] = (outs, grads)

for ti in range(ntiers):
    for j, nm in enumerate(('out', 'grad')):
        a = results['slice'][j][ti]
        bR = results['mask'][j][ti]
        scale = max(np.abs(a).max(), 1e-30)
        print(f'mask tier{ti} {nm}: max|diff| {np.abs(a - bR).max():.3e} '
              f'(rel {np.abs(a - bR).max() / scale:.3e})', flush=True)
