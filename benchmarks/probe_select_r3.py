"""Decompose select_window cost at 26k on the chip: grid sorts, candidate
window + d2, per-species compaction sorts, tier packing. Identifies which
phase a dedicated select kernel should attack."""
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
from nnpops_tpu.geometry import box_transform
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
species = model.species_array
npres = len(layout.present)
pres_table = np.full(layout.num_species + 1, npres, np.int32)
for i, s in enumerate(layout.present):
    pres_table[s] = i
sp_idx_np = pres_table[np.asarray(species, np.int32)]

a_grid = tuple(int(x) for x in layout.ang_cell_grid)
a_ccaps = tuple(int(x) for x in layout.ang_cell_caps)
c_a = sum(a_ccaps)
ncells_a = int(np.prod(a_grid))
cc_a = ncells_a * c_a
kk_a = 27 * c_a
print(f'rad grid {tuple(clist.ncells)} caps {layout.cell_caps}; '
      f'ang grid {a_grid} caps {a_ccaps} kk_a {kk_a}', flush=True)


def dep(x, c):
    """Inject loop-carry dependence into a frozen stage input (prevents
    hoisting out of the timing scan) without changing its value."""
    z = c.reshape(-1)[0]
    if x.dtype == jnp.bool_:
        return x ^ (z > 1e30)
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x + (z > 1e30).astype(x.dtype)
    return x + z * 1e-30


def t(name, fn, *args):
    """Time fn; the first arg is the float carry, remaining args are
    closed-over frozen stage inputs that fn must pass through dep()."""
    def wrapped(c, *rest):
        out = fn(c, *rest)
        return jnp.stack([jnp.sum(x.astype(jnp.float32)) * 1e-9
                          for x in jax.tree.leaves(out)]).sum().reshape(1)
    ms = slope_ms(wrapped, args)
    print(f'{name}: {ms:.3f} ms', flush=True)
    return ms


# ---- full select
def full(p):
    return model.select(p, box, clist)

sel = jax.jit(full)(pos)
jax.block_until_ready(sel.ang.order)
t('FULL select_window', full, pos)

# ---- stage inputs (frozen once)
inv = jnp.linalg.inv(box)
wrap_shift = box_transform(jnp.floor(box_transform(pos, inv)), box)
p_w = pos - wrap_shift


def wrap(p):
    fr = box_transform(p, jnp.linalg.inv(box))
    return p - box_transform(jnp.floor(fr), box)

t('wrap', wrap, pos)
t('grid_sort radial', lambda p: W._grid_sort(
    dep(p_w, p), box, sp_idx_np, tuple(clist.ncells), layout.cell_caps,
    npres), p_w)
t('grid_sort angular', lambda p: W._grid_sort(
    dep(p_w, p), box, sp_idx_np, a_grid, a_ccaps, npres), p_w)

(order, slot_of_sorted, inv_order, cell_sorted,
 counts_a) = jax.jit(lambda p: W._grid_sort(p, box, sp_idx_np, a_grid,
                                            a_ccaps, npres))(p_w)

a_offs = np.cumsum((0,) + a_ccaps)[:-1].astype(np.int32)
f27a_np, stencil_a_np, _ = W._window_tables(a_grid)
entry_np, slotoff_np = W._lane_tables(a_ccaps)
cand_slot = (jnp.asarray(stencil_a_np)[:, jnp.asarray(entry_np)] * c_a
             + jnp.asarray(slotoff_np))
skin = clist.cutoff - basis.radial_cutoff
ang_window = basis.angular_cutoff + max(skin, 0.0)


def window_d2(p_w, order, slot_of_sorted, cell_sorted):
    pos_sorted = p_w[order]
    pos_slots = jnp.full((cc_a, 3), W.FAR, p_w.dtype)
    pos_slots = pos_slots.at[slot_of_sorted].set(pos_sorted, mode='drop')
    shift27a = box_transform(jnp.asarray(f27a_np), box)
    shift_parts_a = [jnp.repeat(shift27a.transpose(2, 0, 1), cs, axis=2)
                     for cs in a_ccaps]
    shift_planes_a = jnp.concatenate(shift_parts_a, axis=2)
    planes = pos_slots.T.reshape(3, ncells_a, c_a)
    wins = []
    for i, cs in enumerate(a_ccaps):
        sub = planes[:, :, a_offs[i]:a_offs[i] + cs]
        wins.append(W._make_stencil_window(a_grid, cs)(sub))
    cand_cells = jnp.concatenate(wins, axis=2) + shift_planes_a
    cand_pos = cand_cells.transpose(1, 0, 2)[cell_sorted]
    dx = cand_pos[:, 0, :] - pos_sorted[:, 0:1]
    dy = cand_pos[:, 1, :] - pos_sorted[:, 1:2]
    dz = cand_pos[:, 2, :] - pos_sorted[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    cand_slot_atom = cand_slot[cell_sorted]
    not_self = cand_slot_atom != slot_of_sorted[:, None]
    valid = (d2 < ang_window * ang_window) & not_self
    return valid, cand_slot_atom

t('window build + d2 + valid',
  lambda c: window_d2(dep(p_w, c), order, slot_of_sorted, cell_sorted), p_w)
valid, cand_slot_atom = jax.jit(window_d2)(p_w, order, slot_of_sorted,
                                           cell_sorted)

t('compact (per-species lane sorts)',
  lambda c: W._compact_window(cc_a, a_ccaps, layout.ang_caps,
                              dep(valid, c), cand_slot_atom), p_w)
t('compact (rank left-pack kernel)',
  lambda c: W._compact_window_kernel(cc_a, a_ccaps, layout.ang_caps,
                                     dep(valid, c), cand_slot_atom), p_w)
nbr, mask, counts, air = jax.jit(
    lambda v, s: W._compact_window(cc_a, a_ccaps, layout.ang_caps, v, s))(
        valid, cand_slot_atom)

g = model.grouping
go = np.asarray(g.order)
pc = tuple(g.counts[sp] for sp in layout.present)
t('build_tier_packed',
  lambda c: W._build_tier_packed(dep(nbr, c), mask, counts, slot_of_sorted,
                                 inv_order, grouping_order=go,
                                 present_counts=tuple(pc), layout=layout,
                                 cc=cc_a), p_w)

# per-species compact split
for i, (lo, w) in enumerate(zip(
        np.cumsum((0,) + tuple(27 * np.asarray(a_ccaps)))[:-1],
        [27 * cs for cs in a_ccaps])):
    def one(c, lo=int(lo), w=int(w), i=i):
        vv = jax.lax.slice_in_dim(dep(valid, c), lo, lo + w, axis=1)
        ss = jax.lax.slice_in_dim(cand_slot_atom, lo, lo + w, axis=1)
        key = jnp.where(vv, ss, jnp.int32(2 ** 31 - 1))
        return jax.lax.sort(key, dimension=1)[:, :layout.ang_caps[i]]
    t(f'  compact sort sp{i} [N,{w}] -> {layout.ang_caps[i]}', one, p_w)
