"""Viability probe: per-step dense-window radial AEV in pure XLA.

Replaces the compacted radial lanes + mirror-adjoint gather with:
  scatter pos -> slots; two-level gather (cells -> atoms) of the 27-cell
  candidate window; fused masked exp-reduce radial; adjoint through the
  dense candidate tensor (segment sums, no mirror).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)


def timeit(name, fn, *args, steps=10, calls=2):
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
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='pallas')
layout = model.blocked_layout
cl = CellList.create(water.box, basis.radial_cutoff,
                     capacity=layout.rad_total)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
species = model.species_array

nx, ny, nz = cl.ncells
ncells = cl.num_cells
c = cl.cell_capacity
kk = 27 * c
rc = basis.radial_cutoff
print(f'ncells {cl.ncells} c {c} kk {kk}', flush=True)

# ---- Frozen (per-refresh) structures, computed once here.
ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
inv = jnp.linalg.inv(box)
frac = pos @ inv
frac = frac - jnp.floor(frac)
cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0, ncells_arr - 1)
cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]
order = jnp.argsort(cell_id, stable=True)
sorted_ids = cell_id[order]
idx_n = jnp.arange(pos.shape[0], dtype=jnp.int32)
new_seg = jnp.concatenate([jnp.ones((1,), bool),
                           sorted_ids[1:] != sorted_ids[:-1]])
seg_start = jax.lax.cummax(jnp.where(new_seg, idx_n, 0))
rank_sorted = idx_n - seg_start
cc = ncells * c
slot_of_sorted = jnp.where(rank_sorted < c, sorted_ids * c + rank_sorted,
                           cc + 1)
stencil = jnp.asarray(cl._stencil())
cand_slot = (stencil[:, :, None] * c
             + jnp.arange(c, dtype=jnp.int32)).reshape(ncells, kk)
# species + slot per window position (frozen per refresh)
sp_slots = jnp.full((cc,), 99, jnp.int32)
sp_slots = sp_slots.at[slot_of_sorted].set(
    jnp.asarray(species, jnp.int32)[order], mode='drop')
win_sp = sp_slots.reshape(ncells, c)[stencil].reshape(ncells, kk)[sorted_ids]
win_slot = cand_slot[sorted_ids]                     # [N, kk]
present_slots = jnp.zeros((cc,), bool).at[slot_of_sorted].set(True,
                                                              mode='drop')
win_present = present_slots.reshape(ncells, c)[stencil].reshape(
    ncells, kk)[sorted_ids]
not_self = win_slot != slot_of_sorted[:, None]
sp_masks = [jnp.asarray((win_present & not_self
                         & (win_sp == s)), jnp.float32)
            for s in layout.present]                 # [N, kk] each

r_eta = float(basis.radial_eta[0])
r_rs = np.asarray(basis.radial_rs, np.float64)

jax.block_until_ready(win_slot)


def radial_dense(p):
    """Per-step dense radial AEV (fwd only)."""
    pos_sorted = p[order]
    pos_slots = jnp.zeros((cc, 3), p.dtype)
    pos_slots = pos_slots.at[slot_of_sorted].set(pos_sorted, mode='drop')
    cand_cells = pos_slots.reshape(ncells, c, 3)[stencil]    # [cells,27,c,3]
    cand_cells = cand_cells.reshape(ncells, kk, 3).transpose(0, 2, 1)
    cand = cand_cells[sorted_ids]                            # [N, 3, kk]
    dx = cand[:, 0, :] - pos_sorted[:, 0:1]
    dy = cand[:, 1, :] - pos_sorted[:, 1:2]
    dz = cand[:, 2, :] - pos_sorted[:, 2:3]
    s3 = jnp.round(dz / box[2, 2])
    dx = dx - s3 * box[2, 0]
    dy = dy - s3 * box[2, 1]
    dz = dz - s3 * box[2, 2]
    s2 = jnp.round(dy / box[1, 1])
    dx = dx - s2 * box[1, 0]
    dy = dy - s2 * box[1, 1]
    dx = dx - jnp.round(dx / box[0, 0]) * box[0, 0]
    d2 = dx * dx + dy * dy + dz * dz
    r = jnp.sqrt(jnp.maximum(d2, 1e-12))
    inside = (d2 < rc * rc).astype(p.dtype)
    fc = jnp.where(d2 < rc * rc,
                   0.5 * jnp.cos(np.pi / rc * r) + 0.5, 0.0)
    cols = []
    for m in sp_masks:
        w = fc * m * inside
        for rs in r_rs:
            u = r - rs
            cols.append(jnp.sum(w * jnp.exp(-r_eta * u * u), axis=1))
    radial = jnp.stack(cols, axis=1) * 0.25              # [N, 2*16]
    return radial


def fwd_only(p):
    return p + 1e-9 * jnp.sum(radial_dense(p)) * jnp.ones((1, 3))


def fwd_bwd(p):
    g = jax.grad(lambda q: jnp.sum(radial_dense(q) ** 2))(p)
    return p + 1e-9 * g


def fwd_bwd_remat(p):
    f = jax.checkpoint(radial_dense)
    g = jax.grad(lambda q: jnp.sum(f(q) ** 2))(p)
    return p + 1e-9 * g

timeit('dense radial fwd', fwd_only, pos)
timeit('dense radial fwd+bwd', fwd_bwd, pos)
timeit('dense radial fwd+bwd (remat)', fwd_bwd_remat, pos)

# parity vs the blocked radial path
from nnpops_tpu.neighbors import blocked as B
from nnpops_tpu.ops.aev_blocked import compute_aev_blocked
sel = jax.jit(lambda p: B.select_blocked(cl, p, box, species, layout,
                                         basis.radial_cutoff,
                                         basis.angular_cutoff))(pos)
pay = jax.jit(lambda p: B.payload_from_blocked(cl, p, box, sel,
                                               rad_only=True))(pos)
ref = compute_aev_blocked(pay, basis, layout).radial
got_s = radial_dense(pos)   # rows in SORTED order; ref rows original order
# map: row i of got_s corresponds to atom order[i]
got = jnp.zeros_like(got_s).at[order].set(got_s)
# ref layout [N, S*R] includes absent species columns; slice present cols
refv = np.asarray(ref).reshape(pos.shape[0], basis.num_species, -1)
gotv = np.asarray(got).reshape(pos.shape[0], len(layout.present), -1)
for i, s in enumerate(layout.present):
    d = np.abs(refv[:, s, :] - gotv[:, i, :])
    rel = d / (np.abs(refv[:, s, :]) + 1e-6)
    print(f'parity species {s}: max abs {d.max():.3e} max rel {rel.max():.3e}',
          flush=True)
print('done', flush=True)
