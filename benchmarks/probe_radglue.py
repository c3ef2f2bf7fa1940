"""Fine-grained attribution of the 26k radial path (round 5): slots build,
stencil window build, kernels, and row extraction timed as nested prefixes
of the exact production chain (frozen selection), fwd and fwd+bwd.

Run after the perm-gather bucketing adjoints landed: probe_glue still shows
radial+glue fwd+bwd ~7.4 ms vs ~4.2 ms of kernels — this locates the rest.
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
from nnpops_tpu.ops.pallas_window import window_radial_aev
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                     nn_dtype='bfloat16', nn_impl='fused')
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=0.25)
layout = model.blocked_layout
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
cl = model.create_cell_list(water.box, skin=0.25)
sel = jax.jit(lambda p: model.select(p, box, cl))(pos)
sel = jax.tree_util.tree_map(jnp.asarray, sel)
g = model.grouping
ao = jnp.asarray(g.order)
n = pos.shape[0]
ncells = cl.num_cells
cell_caps = layout.cell_caps
c = sum(cell_caps)
cc = ncells * c
npres = len(layout.present)
offs = np.cumsum((0,) + cell_caps)[:-1]
num_r = basis.num_radial


def timeit(name, fn, arg, steps=10, calls=3):
    run = jax.jit(lambda a: jax.lax.scan(
        lambda ca, _: (fn(ca), None), a, None, length=steps)[0])
    out = run(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = run(arg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (calls * steps) * 1e3
    print(f'{name}: {dt:.3f} ms/step', flush=True)
    return dt


def stage_slots(p):
    p_w = p - sel.wrap_shift
    p_ext = jnp.concatenate([p_w, jnp.full((1, 3), W.FAR, p.dtype)])
    return W._slot_pos_gather(p_ext, sel.rad_slot_to_atom,
                              sel.rad_slot_of_atom)


def stage_win(p):
    slots = stage_slots(p)
    planes = slots.T.reshape(3, ncells, c)
    wins = []
    for i, cs in enumerate(cell_caps):
        sub = planes[:, :, int(offs[i]):int(offs[i]) + cs]
        wins.append(W._make_stencil_window(cl.ncells, cs)(sub))
    win = jnp.concatenate(wins, axis=2) + sel.shift_planes
    return win, slots


def stage_kernels(p):
    win, slots = stage_win(p)
    centers = slots.reshape(ncells, c, 3)
    perm = sel.cell_perm
    inv_perm = jnp.zeros((ncells,), jnp.int32).at[perm].set(
        jnp.arange(ncells, dtype=jnp.int32))
    nb = layout.num_big_cells
    sc = layout.small_caps
    winp = W._perm_gather_mid(win, perm, inv_perm)
    ctrp = W._perm_gather(centers, perm, inv_perm)
    rad_a = window_radial_aev(
        winp[0, :nb], winp[1, :nb], winp[2, :nb], ctrp[:nb],
        basis.radial_cutoff, basis.radial_eta, basis.radial_rs,
        cell_caps, basis.torchani)
    ctr_small = jnp.concatenate(
        [ctrp[nb:, int(offs[i]):int(offs[i]) + sc[i]]
         for i in range(npres)], axis=1)
    rad_b = window_radial_aev(
        winp[0, nb:], winp[1, nb:], winp[2, nb:], ctr_small,
        basis.radial_cutoff, basis.radial_eta, basis.radial_rs,
        cell_caps, basis.torchani, center_caps=sc)
    return rad_a, rad_b, inv_perm, perm


def stage_full(p):
    rad_a, rad_b, inv_perm, perm = stage_kernels(p)
    sc = layout.small_caps
    nb = layout.num_big_cells
    sc_offs = np.cumsum((0,) + tuple(sc))[:-1]
    ns = ncells - nb
    pieces = []
    for i in range(npres):
        blk = rad_b[:, int(sc_offs[i]):int(sc_offs[i]) + sc[i]]
        padr = cell_caps[i] - sc[i]
        if padr:
            blk = jnp.concatenate(
                [blk, jnp.zeros((ns, padr, blk.shape[2]), blk.dtype)],
                axis=1)
        pieces.append(blk)
    rad_b_full = jnp.concatenate(pieces, axis=1)
    rad_perm = jnp.concatenate([rad_a, rad_b_full], axis=0)
    rad_slots = W._perm_gather(rad_perm, inv_perm, perm)
    rad_flat = rad_slots.reshape(cc, npres * num_r)
    row_atom = sel.tier.row_atom if sel.tier is not None else ao
    row_slots = jnp.minimum(sel.rad_slot_of_atom[row_atom], cc - 1)
    radial_rows = W._row_extract(rad_flat, row_slots, sel.rad_slot_to_row)
    return radial_rows


def fwd_of(stage):
    def f(p):
        out = stage(p)
        tot = sum(jnp.sum(jnp.asarray(o, jnp.float32))
                  for o in jax.tree_util.tree_leaves(out)
                  if jnp.issubdtype(jnp.asarray(o).dtype, jnp.floating))
        return p + 1e-12 * tot * jnp.ones((1, 3))
    return f


def fwdbwd_of(stage):
    def f(p):
        def loss(q):
            out = stage(q)
            return sum(jnp.sum(jnp.asarray(o, jnp.float32) ** 2)
                       for o in jax.tree_util.tree_leaves(out)
                       if jnp.issubdtype(jnp.asarray(o).dtype,
                                         jnp.floating))
        gr = jax.grad(loss)(p)
        return p + 1e-12 * gr
    return f


for name, stage in (('slots', stage_slots), ('win', stage_win),
                    ('kernels', stage_kernels), ('radial full', stage_full)):
    timeit(f'{name} fwd', fwd_of(stage), pos)
    timeit(f'{name} f+b', fwdbwd_of(stage), pos)
