"""Split the mask-select path at 26k: slot-space mask kernel, mask row
gather + repack, lane left-pack, slot reconstruction — vs the per-atom
candidate phase they replace."""
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
from nnpops_tpu.ops.pallas_select import (make_left_pack_lanes,
                                          make_window_mask)
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))

water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
layout = model.blocked_layout
clist = model.create_cell_list(water.box, skin=SKIN)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)

a_grid = tuple(int(x) for x in layout.ang_cell_grid)
a_ccaps = tuple(int(x) for x in layout.ang_cell_caps)
c_a = sum(a_ccaps)
ncells = int(np.prod(a_grid))
kk = 27 * c_a
cc = ncells * c_a
n = pos.shape[0]
npres = len(layout.present)
pres_table = np.full(layout.num_species + 1, npres, np.int32)
for i, s in enumerate(layout.present):
    pres_table[s] = i
sp_idx_np = pres_table[np.asarray(model.species_array, np.int32)]

inv = jnp.linalg.inv(box)
frac = box_transform(pos, inv)
p_w = pos - box_transform(jnp.floor(frac), box)
(order, slot_of_sorted, inv_order, cell_sorted,
 counts_a) = W._grid_sort(p_w, box, sp_idx_np, a_grid, a_ccaps, npres)
pos_sorted = p_w[order]
pos_slots = jnp.full((cc, 3), 1e6, jnp.float32).at[slot_of_sorted].set(
    pos_sorted, mode='drop')
a_offs = np.cumsum((0,) + a_ccaps)[:-1]
f27a, stencil_a, _ = W._window_tables(a_grid)
shift27a = box_transform(jnp.asarray(f27a), box)
shift_planes = jnp.concatenate(
    [jnp.repeat(shift27a.transpose(2, 0, 1), cs, axis=2) for cs in a_ccaps],
    axis=2)
planes = pos_slots.T.reshape(3, ncells, c_a)
wins = [W._make_stencil_window(a_grid, cs)(planes[:, :, a_offs[i]:a_offs[i] + cs])
        for i, cs in enumerate(a_ccaps)]
cand = jnp.concatenate(wins, axis=2) + shift_planes
jax.block_until_ready(cand)
aw = basis.angular_cutoff + SKIN
print(f'grid {a_grid} caps {a_ccaps} kk {kk} cc {cc}', flush=True)

lane_sizes = tuple(27 * cs for cs in a_ccaps)


def _t(label, fn, args):
    ms = slope_ms(fn, args)
    print(f'{label}: {ms:.3f} ms', flush=True)


for dt in (jnp.bfloat16, jnp.float32):
    mask_fn = make_window_mask(float(aw * aw), a_ccaps, out_dtype=dt)

    def mk(cand3):
        m = mask_fn(cand3[0], cand3[1], cand3[2],
                    pos_slots.reshape(ncells, c_a, 3))
        return jnp.sum(m.astype(jnp.float32))

    _t(f'mask kernel alone [{dt.__name__}]',
       lambda cry, cd: cry + 1e-9 * mk(cd + cry[0]), (jnp.zeros((1,)), cand))

    def full_mask(cand3):
        m = mask_fn(cand3[0], cand3[1], cand3[2],
                    pos_slots.reshape(ncells, c_a, 3))
        m_atom = m.reshape(cc, kk)[jnp.minimum(slot_of_sorted, cc - 1)]
        parts = []
        for lo, w in zip(np.cumsum((0,) + lane_sizes)[:-1], lane_sizes):
            p = jax.lax.slice_in_dim(m_atom, int(lo), int(lo) + w, axis=1)
            pw = -(-w // 128) * 128
            if pw != w:
                p = jnp.pad(p, ((0, 0), (0, pw - w)))
            parts.append(p)
        lanes, counts = make_left_pack_lanes(lane_sizes, layout.ang_caps)(
            jnp.concatenate(parts, axis=1))
        return jnp.sum(lanes) + jnp.sum(counts)

    _t(f'mask + gather + left_pack_lanes [{dt.__name__}]',
       lambda cry, cd: cry + 1e-9 * full_mask(cd + cry[0]),
       (jnp.zeros((1,)), cand))

# the full mask compaction incl. slot reconstruction
def full_compact(cand3):
    nbr, mask, counts, air = W._compact_window_mask(
        cc, a_ccaps, layout.ang_caps, cand3, pos_slots, slot_of_sorted,
        cell_sorted, stencil_a, aw * aw)
    return (jnp.sum(nbr) + jnp.sum(counts) + jnp.sum(air)
            ).astype(jnp.float32)


_t('full _compact_window_mask',
   lambda cry, cd: cry + 1e-9 * full_compact(cd + cry[0]),
   (jnp.zeros((1,)), cand))


# the per-atom candidate phase it replaces (d2 + combo + left_pack kernel)
def old_path(cand3):
    cand_pos = cand3.transpose(1, 0, 2)[cell_sorted]
    dx = cand_pos[:, 0, :] - pos_sorted[:, 0:1]
    dy = cand_pos[:, 1, :] - pos_sorted[:, 1:2]
    dz = cand_pos[:, 2, :] - pos_sorted[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    entry_np, slotoff_np = W._lane_tables(a_ccaps)
    cand_slot = (jnp.asarray(stencil_a)[:, jnp.asarray(entry_np)] * c_a
                 + jnp.asarray(slotoff_np))
    cand_slot_atom = cand_slot[cell_sorted]
    not_self = cand_slot_atom != slot_of_sorted[:, None]
    valid = (d2 < aw * aw) & not_self
    nbr, mask, counts, air = W._compact_window_kernel(
        cc, a_ccaps, layout.ang_caps, valid, cand_slot_atom)
    return (jnp.sum(nbr) + jnp.sum(counts) + jnp.sum(air)
            ).astype(jnp.float32)


_t('old d2 + combo + left_pack kernel',
   lambda cry, cd: cry + 1e-9 * old_path(cd + cry[0]),
   (jnp.zeros((1,)), cand))
