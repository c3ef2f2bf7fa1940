"""Cluster-pair radial full path at 26k, slope-timed (tunnel-robust)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_timing import slope_ms

print('devices:', jax.devices(), flush=True)

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors.clusters import (_gather_j, cluster_radial_features)
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
base = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
cluster = base.with_blocked_layout(water.positions, water.box, margin=1.15,
                                   impl='window', skin=SKIN,
                                   radial_impl='cluster')
plan = cluster.blocked_layout.cluster_plan
print(f'plan: ncl {plan.ncl} jcaps {plan.jcaps} cand {plan.cand_caps} '
      f'kmir {plan.kmir}', flush=True)
window = base.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
clist = window.create_cell_list(water.box, skin=SKIN)

csel = jax.jit(lambda p: cluster.select(p, box, clist))(pos)
jax.block_until_ready(csel.ang.order)
row_atom = jnp.arange(pos.shape[0], dtype=jnp.int32)

# radial fwd / fwd+bwd
rad_fwd = lambda p: cluster_radial_features(p, csel.clusters, plan, basis,
                                            row_atom)
rad_bwd = lambda p: jax.grad(lambda q: jnp.sum(cluster_radial_features(
    q, csel.clusters, plan, basis, row_atom) ** 2))(p)
print(f'cluster radial fwd: {slope_ms(rad_fwd, (pos,)):.3f} ms', flush=True)
print(f'cluster radial fwd+bwd: {slope_ms(rad_bwd, (pos,)):.3f} ms',
      flush=True)

# gather alone (fwd) on fixed tiles
cl = plan.cl
n_slots = plan.n_slots
planes0 = jnp.full((n_slots + 1, 3), 1e6, pos.dtype)
planes0 = planes0.at[csel.clusters.slot_of_atom].set(pos, mode='drop')
tiles0 = jnp.concatenate([
    planes0[:n_slots].reshape(plan.ncl_total, cl, 3),
    jnp.full((1, cl, 3), 1e6, pos.dtype)])
jidx = jnp.concatenate([jnp.minimum(jl, plan.ncl_total).reshape(-1)
                        for jl in csel.clusters.jlists])
shf = jnp.concatenate([sh.transpose(1, 2, 0).reshape(-1, 3)
                       for sh in csel.clusters.shifts])
gat = lambda t: _gather_j(t, jidx, shf, csel.clusters.mirror,
                          csel.clusters.mirror_mask)
print(f'gather fwd: {slope_ms(gat, (tiles0,)):.3f} ms', flush=True)
gatb = lambda t: jax.grad(lambda tt: jnp.sum(_gather_j(
    tt, jidx, shf, csel.clusters.mirror, csel.clusters.mirror_mask) ** 2))(t)
print(f'gather fwd+bwd: {slope_ms(gatb, (tiles0,)):.3f} ms', flush=True)

# window radial reference (same harness)
from nnpops_tpu.neighbors.window import window_features
wsel = jax.jit(lambda p: window.select(p, box, clist))(pos)
jax.block_until_ready(wsel.ang.order)
g = window.grouping
ao = jnp.asarray(np.asarray(g.order), jnp.int32)


def wfeat_full(p):
    return window_features(clist, p, box, wsel, basis,
                           window.blocked_layout, atom_order=ao)


def cfeat_full(p):
    return window_features(clist, p, box, csel, basis,
                           cluster.blocked_layout, atom_order=ao,
                           radial_impl='cluster')


for name, fn in (('window feat', wfeat_full), ('cluster feat', cfeat_full)):
    fwd = lambda p, fn=fn: fn(p)
    bwd = lambda p, fn=fn: jax.grad(lambda q: jnp.sum(fn(q) ** 2))(p)
    print(f'{name} fwd: {slope_ms(fwd, (pos,)):.3f} ms', flush=True)
    print(f'{name} fwd+bwd: {slope_ms(bwd, (pos,)):.3f} ms', flush=True)

# selections (slope over refreshes)
def sel_c(p):
    s = cluster.select(p, box, clist)
    return (s.clusters.mirror[:4, :4].astype(jnp.float32)
            + s.clusters.jlists[0][:4, :4]
            + s.clusters.shifts[0][:, :4, :4].sum(0)
            + s.ang.order[:4, None] + s.tier.idx_big[:4, :4])


def sel_w(p):
    s = window.select(p, box, clist)
    return (s.ang.order[:4, None].astype(jnp.float32)
            + s.tier.idx_big[:4, :4] + s.shift_planes[:, :1, :4].sum(0))


print(f'select window: {slope_ms(sel_w, (pos,), n1=2, n2=8):.3f} ms',
      flush=True)
print(f'select cluster: {slope_ms(sel_c, (pos,), n1=2, n2=8):.3f} ms',
      flush=True)
print('done', flush=True)
