"""True window-mode select cost at 26k (all outputs forced) + breakdown.

The earlier 4.7 ms reading consumed only sel.ang.order[0], letting XLA
dead-code-eliminate the sorts and the mirror build.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)


def timeit(name, fn, *args, steps=4, calls=2):
    try:
        run = jax.jit(lambda *a: jax.lax.scan(
            lambda c, _: (fn(*((c,) + a[1:])), None), a[0], None,
            length=steps)[0])
        out = run(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(calls):
            out = run(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (calls * steps) * 1e3
        print(f'{name}: {dt:.3f} ms/call', flush=True)
        return dt
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:2])[:300]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)
        return None


from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel
from nnpops_tpu.neighbors import window as W
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = 0.25
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
layout = model.blocked_layout
cl = model.create_cell_list(water.box, skin=SKIN)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)


def consume(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    tot = 0.0
    for x in leaves:
        tot = tot + jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32
                            else x)
    return tot


def full_select(p):
    s = model.select(p, box, cl)
    return p + 1e-12 * consume(s) * jnp.ones((1, 3))

timeit('select FULL (all outputs forced)', full_select, pos)


# Candidate phase only (cand d2 + valid masks, no compaction/mirror/tier)
def cand_only(p):
    p = jax.lax.stop_gradient(p)
    n = p.shape[0]
    nx, ny, nz = cl.ncells
    ncells = cl.num_cells
    ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
    cell_caps = layout.cell_caps
    npres = len(layout.present)
    c = sum(cell_caps)
    cc = ncells * c
    inv = jnp.linalg.inv(box)
    frac = p @ inv
    wrap_f = jnp.floor(frac)
    frac = frac - wrap_f
    cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0, ncells_arr - 1)
    cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]
    pres_table = np.full(layout.num_species + 1, npres, np.int32)
    for i, s in enumerate(layout.present):
        pres_table[s] = i
    sp_idx_np = pres_table[np.asarray(model.species_array, np.int32)]
    key = cell_id * npres + jnp.asarray(sp_idx_np)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    idx_n = jnp.arange(n, dtype=jnp.int32)
    new_seg = jnp.concatenate([jnp.ones((1,), bool),
                               sorted_key[1:] != sorted_key[:-1]])
    seg_start = jax.lax.cummax(jnp.where(new_seg, idx_n, 0))
    rank_sorted = idx_n - seg_start
    cell_sorted = sorted_key // npres
    sp_sorted = sorted_key % npres
    caps_arr = jnp.asarray(np.asarray(cell_caps, np.int32))
    offs_np = np.cumsum((0,) + cell_caps)[:-1].astype(np.int32)
    slot_of_sorted = jnp.where(
        rank_sorted < caps_arr[sp_sorted],
        cell_sorted * c + jnp.asarray(offs_np)[sp_sorted] + rank_sorted,
        cc + 1)
    p_w = p - wrap_f @ box
    pos_sorted = p_w[order]
    pos_slots = jnp.full((cc, 3), 1e6, p.dtype)
    pos_slots = pos_slots.at[slot_of_sorted].set(pos_sorted, mode='drop')
    f27_np, stencil_np, _ = W._window_tables((nx, ny, nz))
    shift27 = jnp.asarray(f27_np) @ box
    shift_parts = [jnp.repeat(shift27.transpose(2, 0, 1), cs, axis=2)
                   for cs in cell_caps]
    shift_planes = jnp.concatenate(shift_parts, axis=2)
    planes = pos_slots.T.reshape(3, ncells, c)
    wins = []
    for i, cs in enumerate(cell_caps):
        sub = planes[:, :, int(offs_np[i]):int(offs_np[i]) + cs]
        wins.append(W._make_stencil_window((nx, ny, nz), cs)(sub))
    cand_cells = jnp.concatenate(wins, axis=2) + shift_planes
    cand_pos = cand_cells.transpose(1, 0, 2)[cell_sorted]
    dx = cand_pos[:, 0, :] - pos_sorted[:, 0:1]
    dy = cand_pos[:, 1, :] - pos_sorted[:, 1:2]
    dz = cand_pos[:, 2, :] - pos_sorted[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    return p + 1e-12 * (jnp.sum(d2) + jnp.sum(slot_of_sorted)) * jnp.ones((1, 3))

timeit('candidate phase only', cand_only, pos)


# Stage-1 packed sort alone on a [N, kk] uint32 array; and top_k variant.
kk = 27 * sum(layout.cell_caps)
n = pos.shape[0]
keys0 = jax.random.randint(jax.random.PRNGKey(0), (n, kk), 0,
                           2 ** 31 - 1, jnp.int32)
k1 = 48


def sort_stage1(k):
    s = jax.lax.sort(k, dimension=1)[:, :k1]
    return k + jnp.sum(s).astype(jnp.int32)


def topk_stage1(k):
    v, _ = jax.lax.top_k(-k, k1)
    return k + jnp.sum(v).astype(jnp.int32)

timeit('stage-1 full sort [N,kk]', sort_stage1, keys0)
timeit('stage-1 top_k(48) [N,kk]', topk_stage1, keys0)


# Mirror build alone (two flat sorts of N*Kat packed keys).
sel = jax.jit(lambda p: model.select(p, box, cl))(pos)
jax.block_until_ready(sel.ang.order)
from nnpops_tpu.neighbors.blocked import _build_mirror
cc = cl.num_cells * cl.cell_capacity


def mirror_only(p):
    slot32 = sel.ang.slot_of_sorted + (p[0, 0] * 0).astype(jnp.int32)
    m = _build_mirror(slot32, sel.ang.nbr_rad, sel.ang.rad_mask, cc)
    return p + 1e-12 * jnp.sum(m).astype(jnp.float32) * jnp.ones((1, 3))

timeit('mirror build alone', mirror_only, pos)
print('done', flush=True)
