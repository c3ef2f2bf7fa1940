"""Round-3 fine-grained splits at 26k: gather vs kernel inside the angular
path, glue vs kernel inside the radial path. One number per piece so the
optimization targets are the measured hot spots, not guesses.

PHASE env:
  1 = angular pieces (tier gather fwd / fwd+bwd, pallas kernel fwd / fwd+bwd
      on frozen deltas)
  2 = radial pieces (window build glue, window kernel fwd / fwd+bwd on
      frozen windows)
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
from nnpops_tpu.neighbors.window import (
    _make_stencil_window, _part_deltas, _tiered_gather, ang_as_rad_layout)
from nnpops_tpu.neighbors.blocked import BlockedLayout
from nnpops_tpu.ops.pallas_aev import angular_aev_pallas
from nnpops_tpu.ops.pallas_window import window_radial_aev
from nnpops_tpu.utils.water import make_water_box

PHASE = int(os.environ.get('PHASE', '1'))
NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))

water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                     nn_dtype=jnp.bfloat16, nn_impl='fused')
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
params = init_ani_params(jax.random.PRNGKey(0), basis)
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

print(f'tier shapes: {[ix.shape for ix in t.idx]}', flush=True)

if PHASE == 1:
    from nnpops_tpu.neighbors.window import tier_bwd_impl, tier_layouts
    caps_all = (layout.ang_caps,) + tuple(layout.ang_tier_caps)
    lays = tier_layouts(layout)

    def slots_of(p):
        ps = p[sel.ang.order]
        s = jnp.zeros((cc_a + 2, 3), p.dtype)
        return s.at[sel.ang.slot_of_sorted].set(ps, mode='drop')

    def gather_only(p):
        slots = slots_of(p)
        outs = _tiered_gather(slots, t.idx, t.mir, t.mask, t.slot_rows)
        return sum(o.sum() for o in outs)

    # Frozen deltas: kernel-only cost (no gather on the path).
    def make_deltas(p):
        slots = slots_of(p)
        outs = _tiered_gather(slots, t.idx, t.mir, t.mask, t.slot_rows)
        ctrs = [slots[jnp.minimum(sr, cc_a + 1)] for sr in t.slot_rows]
        return tuple(_part_deltas(o, c, m, box)
                     for o, c, m in zip(outs, ctrs, t.mask))

    deltas = jax.jit(make_deltas)(pos)
    jax.block_until_ready(deltas[0])

    cases = [('tier gather fwd', gather_only, (pos,)),
             ('tier gather fwd+bwd',
              lambda p: jax.grad(gather_only)(p).sum(), (pos,))]
    for ti in range(len(caps_all)):
        def kern(d, ti=ti):
            return angular_aev_pallas(d, t.mask[ti], basis, lays[ti],
                                      rad_width=d.shape[2],
                                      bwd_impl=tier_bwd_impl(caps_all[ti]))
        cases.append((f'ang kernel t{ti} {deltas[ti].shape} fwd',
                      kern, (deltas[ti],)))
        cases.append((f'ang kernel t{ti} fwd+bwd',
                      lambda d, kern=kern: jax.grad(
                          lambda q: jnp.sum(kern(q) ** 2))(d).sum(),
                      (deltas[ti],)))
    for name, f, arg in cases:
        print(f'{name}: {slope_ms(f, arg):.3f} ms', flush=True)
elif PHASE == 2:
    from nnpops_tpu.neighbors.window import FAR
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

    def glue_only(p):
        win, centers = windows_of(p)
        return win.sum() + centers.sum()

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
    print(f'radial: ncells {ncells} c {c} kk {27 * c} nb {nb} sc {sc}',
          flush=True)

    def kern_full(cx, cy, cz, ctr):
        return window_radial_aev(cx, cy, cz, ctr, basis.radial_cutoff,
                                 basis.radial_eta, basis.radial_rs,
                                 cell_caps, basis.torchani)

    def kern_small_cells(cx, cy, cz, ctr):
        return window_radial_aev(cx, cy, cz, ctr, basis.radial_cutoff,
                                 basis.radial_eta, basis.radial_rs,
                                 cell_caps, basis.torchani, center_caps=sc)

    for name, f, arg in [
            ('window build glue fwd', glue_only, (pos,)),
            ('window build glue fwd+bwd',
             lambda p: jax.grad(glue_only)(p).sum(), (pos,)),
            ('radial kernel big fwd', lambda *a: kern_full(*a), wb),
            ('radial kernel big fwd+bwd',
             lambda *a: jax.grad(
                 lambda *q: jnp.sum(kern_full(*q) ** 2), argnums=(0, 1, 2, 3)
             )(*a)[0].sum(), wb),
            ('radial kernel small fwd', lambda *a: kern_small_cells(*a), ws),
            ('radial kernel small fwd+bwd',
             lambda *a: jax.grad(
                 lambda *q: jnp.sum(kern_small_cells(*q) ** 2),
                 argnums=(0, 1, 2, 3))(*a)[0].sum(), ws),
    ]:
        print(f'{name}: {slope_ms(f, arg):.3f} ms', flush=True)
print('done', flush=True)
