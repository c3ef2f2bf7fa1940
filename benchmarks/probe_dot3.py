"""A/B the angular kernel's selection-matmul implementation on production
26k tier shapes: 'highest' (Mosaic bf16x6) vs 'split3' (hand-rolled bf16x3
against constant 0/1 matrices — exact f32 reconstruction, half the MXU
passes). Reports per-kernel fwd / fwd+bwd ms and the max |diff| between the
two implementations' outputs and gradients (expected ~f32 roundoff).
"""
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
                                         tier_layouts)
from nnpops_tpu.neighbors.blocked import BlockedLayout
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
a_full, a_small = lays[0], lays[-1]


def make_deltas(p):
    ps = p[sel.ang.order]
    slots = jnp.zeros((cc_a + 2, 3), p.dtype)
    slots = slots.at[sel.ang.slot_of_sorted].set(ps, mode='drop')
    outs = _tiered_gather(slots, t.idx, t.mir, t.mask, t.slot_rows)
    ctrs = [slots[jnp.minimum(sr, cc_a + 1)] for sr in t.slot_rows]
    return (_part_deltas(outs[0], ctrs[0], t.mask[0], box),
            _part_deltas(outs[-1], ctrs[-1], t.mask[-1], box))


db, ds = jax.jit(make_deltas)(pos)
jax.block_until_ready(db)
print(f'tier shapes: first {db.shape} last {ds.shape}', flush=True)

results = {}
for impl in ('highest', 'split3', 'mixed'):
    def kb(d, impl=impl):
        return angular_aev_pallas(d, t.mask[0], basis, a_full,
                                  rad_width=d.shape[2], bwd_impl='v1',
                                  dot_impl=impl)

    def ks(d, impl=impl):
        return angular_aev_pallas(d, t.mask[-1], basis, a_small,
                                  rad_width=d.shape[2], bwd_impl='v2',
                                  dot_impl=impl)

    ob = jax.jit(kb)(db)
    os_ = jax.jit(ks)(ds)
    gb = jax.jit(jax.grad(lambda d: jnp.sum(kb(d) ** 2)))(db)
    gs = jax.jit(jax.grad(lambda d: jnp.sum(ks(d) ** 2)))(ds)
    results[impl] = (np.asarray(ob), np.asarray(os_), np.asarray(gb),
                     np.asarray(gs))
    for name, f, arg in [
            (f'{impl} big fwd', kb, (db,)),
            (f'{impl} big fwd+bwd',
             lambda d, kb=kb: jax.grad(
                 lambda q: jnp.sum(kb(q) ** 2))(d).sum(), (db,)),
            (f'{impl} small fwd', ks, (ds,)),
            (f'{impl} small fwd+bwd',
             lambda d, ks=ks: jax.grad(
                 lambda q: jnp.sum(ks(q) ** 2))(d).sum(), (ds,)),
    ]:
        print(f'{name}: {slope_ms(f, arg):.3f} ms', flush=True)

for other in ('split3', 'mixed'):
    for i, name in enumerate(('out big', 'out small', 'grad big',
                              'grad small')):
        a, b = results['highest'][i], results[other][i]
        scale = max(np.abs(a).max(), 1e-30)
        print(f'{other} {name}: max|diff| {np.abs(a - b).max():.3e} '
              f'(rel {np.abs(a - b).max() / scale:.3e})', flush=True)
