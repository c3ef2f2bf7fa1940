"""Decompose select_blocked cost at 26k atoms on the chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)


def timeit(name, fn, *args, steps=5, calls=2):
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
        print(f'{name}: {dt:.3f} ms/step', flush=True)
        return dt
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:2])[:300]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)
        return None


from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel
from nnpops_tpu.neighbors import blocked as B
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='pallas')
layout = model.blocked_layout
print('layout rad_caps', layout.rad_caps, 'ang_caps', layout.ang_caps,
      flush=True)
cl = CellList.create(water.box, basis.radial_cutoff,
                     capacity=layout.rad_total)
print('ncells', cl.ncells, 'cell_capacity', cl.cell_capacity, flush=True)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
species = model.species_array

# full select
def full_select(p):
    sel = B.select_blocked(cl, p, box, species, layout,
                          basis.radial_cutoff, basis.angular_cutoff)
    return p + 1e-9 * sel.order[0].astype(jnp.float32) * jnp.ones((1, 3))

timeit('select_blocked full', full_select, pos)

# pieces: candidate build (everything before _compact_blocked)
def candidates_only(p):
    p = jax.lax.stop_gradient(p)
    n = p.shape[0]
    nx, ny, nz = cl.ncells
    ncells = cl.num_cells
    ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
    inv = jnp.linalg.inv(box)
    frac = p @ inv
    frac = frac - jnp.floor(frac)
    cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0, ncells_arr - 1)
    cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]
    order = jnp.argsort(cell_id, stable=True)
    sorted_ids = cell_id[order]
    idx_n = jnp.arange(n, dtype=jnp.int32)
    new_seg = jnp.concatenate([jnp.ones((1,), bool),
                               sorted_ids[1:] != sorted_ids[:-1]])
    seg_start = jax.lax.cummax(jnp.where(new_seg, idx_n, 0))
    rank_sorted = idx_n - seg_start
    c = cl.cell_capacity
    cc = ncells * c
    slot_of_sorted = jnp.where(rank_sorted < c,
                               sorted_ids * c + rank_sorted, cc + 1)
    pos_sorted = p[order]
    pos_slots = jnp.zeros((cc, 3), p.dtype)
    pos_slots = pos_slots.at[slot_of_sorted].set(pos_sorted, mode='drop')
    stencil = jnp.asarray(cl._stencil())
    kk = 27 * c
    cand_pos_cells = pos_slots.reshape(ncells, c, 3)[stencil]
    cand_pos_cells = cand_pos_cells.reshape(ncells, kk, 3).transpose(0, 2, 1)
    cand_pos = cand_pos_cells[sorted_ids]
    delta = cand_pos - pos_sorted[:, :, None]
    d2 = jnp.sum(delta * delta, axis=1)
    return p + 1e-12 * d2[0, 0] * jnp.ones((1, 3))

timeit('candidate build (thru d2)', candidates_only, pos)


# one packed sort [N, kk]
kk = 27 * cl.cell_capacity
key = jax.random.randint(jax.random.PRNGKey(0), (water.positions.shape[0], kk),
                         0, 1 << 30, jnp.int32)

def one_sort(k):
    s = jax.lax.sort(k, dimension=1)
    return k + s[:1, :1]

timeit(f'one int32 sort [N,{kk}]', one_sort, key)

ktot = layout.rad_total + layout.ang_total
key2 = jax.random.randint(jax.random.PRNGKey(1),
                          (water.positions.shape[0], ktot), 0, 1 << 30,
                          jnp.int32)
timeit(f'one int32 sort [N,{ktot}]', one_sort, key2)

# mirror build: two 3-operand flat sorts of N*K
n = water.positions.shape[0]
flat = jnp.arange(n * ktot, dtype=jnp.int32)
k1 = jax.random.randint(jax.random.PRNGKey(2), (n * ktot,), 0, 1 << 24,
                        jnp.int32)
k2 = jax.random.randint(jax.random.PRNGKey(3), (n * ktot,), 0, 1 << 24,
                        jnp.int32)

def mirror_sorts(a):
    _, _, v1 = jax.lax.sort([a, k2, flat], num_keys=2)
    _, _, v2 = jax.lax.sort([k2, a, flat], num_keys=2)
    return a + v1[:1] + v2[:1]

timeit(f'mirror: two 3-op flat sorts [{n*ktot}]', mirror_sorts, k1)

# ang_in_rad match: [N, Kat, Krt] compare
sel = jax.jit(lambda p: B.select_blocked(cl, p, box, species, layout,
                                         basis.radial_cutoff,
                                         basis.angular_cutoff))(pos)
jax.block_until_ready(sel.order)


def ang_match(nr):
    na = sel.nbr_ang
    match = (na[:, :, None] == nr[:, None, :]) \
        & sel.ang_mask[:, :, None] & sel.rad_mask[:, None, :]
    air = jnp.where(jnp.any(match, axis=2),
                    jnp.argmax(match, axis=2).astype(jnp.int32),
                    nr.shape[1])
    return nr + air[:1, :1]

timeit('ang_in_rad match', ang_match, sel.nbr_rad)
print('done', flush=True)
