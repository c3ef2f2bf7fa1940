"""Round-3 composition probe at 26k: one number per pipeline component on
the real chip, all in one process (persistent compile cache).

Stages gated by env PHASE:
  1 = frozen-step components (radial fwd/fwd+bwd, angular fwd/fwd+bwd,
      NN fused, full step from selection)
  2 = select FULL (all outputs forced) + bench-style amortized step
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
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors.window import window_features, _tiered_angular
from nnpops_tpu.utils.water import make_water_box

PHASE = int(os.environ.get('PHASE', '1'))
NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))
NN_IMPL = os.environ.get('NN_IMPL', 'fused')
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                     nn_dtype=jnp.bfloat16, nn_impl=NN_IMPL)
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
clist = model.create_cell_list(water.box, skin=SKIN)
sel = jax.jit(lambda p: model.select(p, box, clist))(pos)
jax.block_until_ready(sel.ang.order)
layout = model.blocked_layout
g = model.grouping
ao = jnp.asarray(np.asarray(g.order), jnp.int32)

if PHASE == 1:
    cc_a = (int(np.prod(layout.ang_cell_grid)) * sum(layout.ang_cell_caps)
            if layout.ang_cell_grid is not None
            else clist.num_cells * sum(layout.cell_caps))

    def ang_only(p):
        _, ang = _tiered_angular(p, box, sel, basis, layout, cc_a, None)
        return ang

    def feat(p):
        return window_features(clist, p, box, sel, basis, layout,
                               atom_order=ao)

    def step(p):
        e, f = model.energy_and_forces_from_selection(params, p, box,
                                                      clist, sel)
        return f

    for name, f in [('ang fwd', ang_only),
                    ('ang fwd+bwd', lambda p: jax.grad(
                        lambda q: jnp.sum(ang_only(q) ** 2))(p)),
                    ('feat fwd', feat),
                    ('feat fwd+bwd', lambda p: jax.grad(
                        lambda q: jnp.sum(feat(q) ** 2))(p)),
                    ('full step (E+F)', step)]:
        print(f'{name}: {slope_ms(f, (pos,)):.3f} ms', flush=True)
elif PHASE == 2:
    def sel_full(p):
        s = model.select(p, box, clist)
        acc = (s.ang.order[:4, None].astype(jnp.float32)
               + s.shift_planes[:, :1, :4].sum(0)
               + s.rad_slot_of_atom[:4, None]
               + s.max_cell_sp[:1, None] + s.max_cell_sp_ang[:1, None])
        if s.tier is not None:
            t = s.tier
            acc = (acc + t.idx_big[:4, :4] + t.mir_big[:4, :4]
                   + t.idx_small[:4, :4] + t.mir_small[:4, :4]
                   + t.row_atom[:4, None] + t.concat_pos[:4, None]
                   + t.big_counts[:1, None])
        return acc
    print(f'select FULL: {slope_ms(sel_full, (pos,), n1=2, n2=8):.3f} ms',
          flush=True)
print('done', flush=True)
