"""Minimal cluster-vs-window radial probe at 26k with persistent compile
cache. Stages gated by env PHASE: 1 = cluster feat only, 2 = window feat,
3 = selects."""
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
from nnpops_tpu.neighbors.window import window_features
from nnpops_tpu.utils.water import make_water_box

PHASE = int(os.environ.get('PHASE', '1'))
NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
base = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)

if PHASE in (1, 3):
    cluster = base.with_blocked_layout(water.positions, water.box,
                                       margin=1.15, impl='window', skin=SKIN,
                                       radial_impl='cluster')
    # with_blocked_layout silently falls back to the window kernel when
    # plan_clusters rejects the box — without this the probe would time
    # window-vs-window and report a bogus tie.
    assert cluster.window_radial == 'cluster', 'cluster plan rejected'
    clist = cluster.create_cell_list(water.box, skin=SKIN)
    csel = jax.jit(lambda p: cluster.select(p, box, clist))(pos)
    jax.block_until_ready(csel.ang.order)
if PHASE in (2, 3):
    window = base.with_blocked_layout(water.positions, water.box,
                                      margin=1.15, impl='window', skin=SKIN)
    clist_w = window.create_cell_list(water.box, skin=SKIN)
    wsel = jax.jit(lambda p: window.select(p, box, clist_w))(pos)
    jax.block_until_ready(wsel.ang.order)

if PHASE == 1:
    ao = jnp.asarray(np.asarray(cluster.grouping.order), jnp.int32)
elif PHASE == 2:
    ao = jnp.asarray(np.asarray(window.grouping.order), jnp.int32)

if PHASE == 1:
    def cfeat(p):
        return window_features(clist, p, box, csel, basis,
                               cluster.blocked_layout, atom_order=ao,
                               radial_impl='cluster')
    bwd = lambda p: jax.grad(lambda q: jnp.sum(cfeat(q) ** 2))(p)
    print(f'cluster feat fwd: {slope_ms(cfeat, (pos,)):.3f} ms', flush=True)
    print(f'cluster feat fwd+bwd: {slope_ms(bwd, (pos,)):.3f} ms', flush=True)
elif PHASE == 2:
    def wfeat(p):
        return window_features(clist_w, p, box, wsel, basis,
                               window.blocked_layout, atom_order=ao)
    bwd = lambda p: jax.grad(lambda q: jnp.sum(wfeat(q) ** 2))(p)
    print(f'window feat fwd: {slope_ms(wfeat, (pos,)):.3f} ms', flush=True)
    print(f'window feat fwd+bwd: {slope_ms(bwd, (pos,)):.3f} ms', flush=True)
else:
    def sel_c(p):
        s = cluster.select(p, box, clist)
        return (s.clusters.mirror[:4, :4].astype(jnp.float32)
                + s.clusters.jlists[0][:4, :4]
                + s.clusters.shifts[0][:, :4, :4].sum(0)
                + s.ang.order[:4, None] + s.tier.idx_big[:4, :4])

    def sel_w(p):
        s = window.select(p, box, clist_w)
        return (s.ang.order[:4, None].astype(jnp.float32)
                + s.tier.idx_big[:4, :4] + s.shift_planes[:, :1, :4].sum(0))
    print(f'select window: {slope_ms(sel_w, (pos,), n1=2, n2=8):.3f} ms',
          flush=True)
    print(f'select cluster: {slope_ms(sel_c, (pos,), n1=2, n2=8):.3f} ms',
          flush=True)
print('done', flush=True)
