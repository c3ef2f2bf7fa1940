"""A/B the cutoff-function implementation on production 26k shapes:
'cos' (0.5 cos(pi r / rc) + 0.5, transcendental per pair) vs 'poly'
(degree-8 Horner chain in t = (r/rc)^2 — exact to f64 roundoff since
cos(pi sqrt(t)) is entire in t). Covers the angular tiers and the radial
window kernel; reports fwd / fwd+bwd ms per piece and max |diff|."""
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
from nnpops_tpu.neighbors.window import (FAR, _make_stencil_window,
                                         _part_deltas, _tiered_gather,
                                         tier_bwd_impl, tier_layouts)
from nnpops_tpu.ops.pallas_aev import angular_aev_pallas
from nnpops_tpu.ops.pallas_window import window_radial_aev
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

# ---- angular tiers ----
ang = {}
for impl in ('cos', 'poly'):
    outs, grads, tf, tb = [], [], 0.0, 0.0
    for ti in range(ntiers):
        def k(d, ti=ti, impl=impl):
            return angular_aev_pallas(
                d, t.mask[ti], basis, lays[ti], rad_width=d.shape[2],
                bwd_impl=tier_bwd_impl(caps_all[ti]), fc_impl=impl)
        outs.append(np.asarray(jax.jit(k)(ds[ti])))
        fb = jax.jit(jax.grad(lambda d, k=k: jnp.sum(k(d) ** 2)))
        grads.append(np.asarray(fb(ds[ti])))
        a = slope_ms(jax.jit(k), (ds[ti],))
        b = slope_ms(fb, (ds[ti],))
        tf += a
        tb += b
        print(f'ang {impl} tier{ti}: fwd {a:.3f} / fwd+bwd {b:.3f} ms',
              flush=True)
    print(f'ang {impl} SUM: fwd {tf:.3f} / fwd+bwd {tb:.3f} ms', flush=True)
    ang[impl] = (outs, grads)

for ti in range(ntiers):
    for j, nm in enumerate(('out', 'grad')):
        a, bR = ang['cos'][j][ti], ang['poly'][j][ti]
        scale = max(np.abs(a).max(), 1e-30)
        print(f'ang poly tier{ti} {nm}: max|diff| {np.abs(a - bR).max():.3e}'
              f' (rel {np.abs(a - bR).max() / scale:.3e})', flush=True)

# ---- radial window kernel ----
cell_caps = layout.cell_caps
c = sum(cell_caps)
ncells = clist.num_cells
cc = ncells * c
offs = np.cumsum((0,) + cell_caps)[:-1]


def windows_of(p):
    p_w = p - sel.wrap_shift
    ps = p_w[sel.rad_order]
    slots = jnp.full((cc, 3), FAR, p.dtype)
    slots = slots.at[sel.rad_slot_of_sorted].set(ps, mode='drop')
    planes = slots.T.reshape(3, ncells, c)
    wins = []
    for i, cs in enumerate(cell_caps):
        sub = planes[:, :, int(offs[i]):int(offs[i]) + cs]
        wins.append(_make_stencil_window(clist.ncells, cs)(sub))
    win = jnp.concatenate(wins, axis=2) + sel.shift_planes
    centers = slots.reshape(ncells, c, 3)
    return win, centers


win, centers = jax.jit(windows_of)(pos)
jax.block_until_ready(win)
nb = layout.num_big_cells
sc = layout.small_caps
perm = sel.cell_perm
winp = win[:, perm]
ctrp = centers[perm]
wb = (winp[0, :nb], winp[1, :nb], winp[2, :nb], ctrp[:nb])
ctr_small = jnp.concatenate(
    [ctrp[nb:, int(offs[i]):int(offs[i]) + sc[i]]
     for i in range(len(cell_caps))], axis=1)
ws = (winp[0, nb:], winp[1, nb:], winp[2, nb:], ctr_small)

rad = {}
for impl in ('cos', 'poly'):
    def kb(cx, cy, cz, ctr, impl=impl):
        return window_radial_aev(cx, cy, cz, ctr, basis.radial_cutoff,
                                 basis.radial_eta, basis.radial_rs,
                                 cell_caps, basis.torchani, fc_impl=impl)

    def ks(cx, cy, cz, ctr, impl=impl):
        return window_radial_aev(cx, cy, cz, ctr, basis.radial_cutoff,
                                 basis.radial_eta, basis.radial_rs,
                                 cell_caps, basis.torchani, center_caps=sc,
                                 fc_impl=impl)

    vals, tot = [], 0.0
    for name, f, arg in [('big', kb, wb), ('small', ks, ws)]:
        vals.append(np.asarray(jax.jit(f)(*arg)))
        fb = jax.jit(jax.grad(lambda *q, f=f: jnp.sum(f(*q) ** 2),
                              argnums=(0, 1, 2, 3)))
        vals.append(np.asarray(fb(*arg)[0]))
        a = slope_ms(jax.jit(f), arg)
        b = slope_ms(lambda *q, fb=fb: fb(*q)[0].sum(), arg)
        tot += a + b
        print(f'rad {impl} {name}: fwd {a:.3f} / fwd+bwd {b:.3f} ms',
              flush=True)
    print(f'rad {impl} SUM fwd+fwdbwd: {tot:.3f} ms', flush=True)
    rad[impl] = vals

for j, nm in enumerate(('big out', 'big grad', 'small out', 'small grad')):
    a, bR = rad['cos'][j], rad['poly'][j]
    scale = max(np.abs(a).max(), 1e-30)
    print(f'rad poly {nm}: max|diff| {np.abs(a - bR).max():.3e} '
          f'(rel {np.abs(a - bR).max() / scale:.3e})', flush=True)
print('done', flush=True)
