"""Round-4 select A/B at 26k: full select_window with the mask-driven
compaction (slot-space validity kernel + lane-index left-pack) vs the
round-3 per-atom paths ('kernel' rank left-pack on slot keys, 'sort')."""
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
from nnpops_tpu.neighbors import window as W
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))

water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                     nn_dtype=jnp.bfloat16, nn_impl='fused')
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
layout = model.blocked_layout
clist = model.create_cell_list(water.box, skin=SKIN)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
g = model.grouping
pc = tuple(g.counts[s] for s in layout.present)
kw = dict(grouping_order=np.asarray(g.order), present_counts=pc,
          need_shift_planes=True)


def force_all(sel):
    t = sel.tier
    acc = (jnp.sum(sel.ang.nbr_rad) + jnp.sum(sel.ang.slot_of_sorted)
           + jnp.sum(sel.max_cell_sp) + jnp.sum(sel.rad_slot_of_atom))
    if t is not None:
        for ix, mr in zip(t.idx, t.mir):
            acc = acc + jnp.sum(ix) + jnp.sum(mr)
        acc = acc + jnp.sum(t.row_atom) + jnp.sum(t.concat_pos)
    return acc.astype(jnp.float32)


for impl in ('mask', 'kernel'):
    def full(p0, _impl=impl):
        sel = W.select_window(clist, p0, box,
                              model.species_array, layout,
                              basis.radial_cutoff, basis.angular_cutoff,
                              compact_impl=_impl, **kw)
        return force_all(sel)[None]

    # Thread the carry into the positions so every scanned iteration is
    # data-dependent (no hoisting/CSE).
    ms = slope_ms(lambda c, p: c + 1e-9 * full(p + 1e-12 * c[0]),
                  (jnp.zeros((1,)), pos))
    print(f'select FULL [{impl}]: {ms:.3f} ms', flush=True)
