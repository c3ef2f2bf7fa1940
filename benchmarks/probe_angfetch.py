"""VERDICT r3 item 2: attack the angular row-gather latency wall.

A/B at 26k production shapes:
  (a) the production per-row HBM gather (``_tiered_gather`` through the
      packed mirror; fwd and fwd+bwd) — measured at the ~4.5 ns/row wall;
  (b) cell-granular fetch + in-VMEM compaction: a Pallas kernel reads each
      cell's coarse 27-cell window (pure-bandwidth block copies, exactly
      like the radial window kernel), and compacts each center row's
      frozen packed lanes out of the window INSIDE VMEM. TPU VMEM has no
      per-row dynamic gather (Mosaic dynamic_gather crashes beyond one
      tile — NOTES_PERF r2), so the compaction is expressed as K
      extraction passes (lane-compare + masked sum) per coordinate plane
      over the [c, kk] window — dense VPU work instead of HBM latency.

The question this probe answers: is K x 4 dense passes over [c, kk]
cheaper than one latency-bound HBM row-gather per packed row? Op count
says no by ~4x (ncells x c x kk x K x 4 ~ 14.5 G elem-ops vs 780k rows x
4.5 ns ~ 3.5 ms), but the VERDICT asks for the measured verdict either
way; this records it.
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
from jax.experimental import pallas as pl

from tpu_timing import slope_ms

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel
from nnpops_tpu.neighbors import window as W
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))
KCAP = int(os.environ.get('KCAP', '48'))   # packed lanes per row to fetch

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
sel = jax.jit(lambda p: model.select(p, box, clist))(pos)
jax.block_until_ready(sel.ang.order)
t = sel.tier

a_grid = tuple(int(x) for x in layout.ang_cell_grid)
a_ccaps = tuple(int(x) for x in layout.ang_cell_caps)
c = sum(a_ccaps)
kk = 27 * c
ncells = int(np.prod(a_grid))
cc = ncells * c
print(f'tier shapes {[ix.shape for ix in t.idx]}; ang grid {a_grid} '
      f'c {c} kk {kk}', flush=True)

# ---- (a) the production tiered gather --------------------------------------
slots = jnp.zeros((cc + 2, 3), jnp.float32).at[sel.ang.slot_of_sorted].set(
    pos[sel.ang.order], mode='drop')


def run_gather(s):
    outs = W._tiered_gather(s, t.idx, t.mir, t.mask, t.slot_rows)
    return sum(jnp.sum(o) for o in outs)


ms = slope_ms(lambda cry, s: cry + 1e-9 * run_gather(s + cry[0]),
              (jnp.zeros((1,)), slots))
print(f'tiered gather fwd: {ms:.3f} ms', flush=True)
g = jax.grad(lambda s: run_gather(s))
ms = slope_ms(lambda cry, s: cry + 1e-9 * jnp.sum(g(s + cry[0])),
              (jnp.zeros((1,)), slots))
print(f'tiered gather fwd+bwd: {ms:.3f} ms', flush=True)

# ---- (b) cell-granular fetch + in-VMEM extraction compaction ---------------
# Frozen per-slot packed window lanes (probe setup, off the timed path):
# global window lane of neighbor slot s2 as seen from center slot s1.
stencil_np = W._window_tables(a_grid)[1]
nbr = np.asarray(sel.ang.nbr_rad)[:, :KCAP]          # [N, K] slot ids
msk = np.asarray(sel.ang.rad_mask)[:, :KCAP]
s1 = np.asarray(sel.ang.slot_of_sorted)
nx, ny, nz = a_grid
c1 = np.minimum(s1, cc - 1) // c
c2 = np.minimum(nbr, cc - 1) // c
so2 = np.minimum(nbr, cc - 1) - c2 * c


def axis_off(a1, a2, na):
    return (a2 - a1 + 1) % na


e = (axis_off((c1 // (ny * nz))[:, None], c2 // (ny * nz), nx) * 9
     + axis_off(((c1 // nz) % ny)[:, None], (c2 // nz) % ny, ny) * 3
     + axis_off((c1 % nz)[:, None], c2 % nz, nz))
offs = np.cumsum((0,) + a_ccaps)[:-1]
wb = 27 * offs
sp_of_so = np.zeros(c, np.int64)
for s in range(1, len(a_ccaps)):
    sp_of_so[offs[s]:] = s
sp2 = sp_of_so[so2]
lane = wb[sp2] + e * np.asarray(a_ccaps)[sp2] + (so2 - offs[sp2])
lane = np.where(msk, lane, kk)                       # sentinel -> no match
lanes_slot = np.full((ncells * c, KCAP), kk, np.int32)
lanes_slot[np.minimum(s1, cc - 1)] = lane.astype(np.int32)
lanes_slot = lanes_slot.reshape(ncells, c, KCAP)
kcp = -(-KCAP // 128) * 128
lanes_slot = np.pad(lanes_slot, ((0, 0), (0, 0), (0, kcp - KCAP)),
                    constant_values=kk)

planes = slots[:cc].T.reshape(3, ncells, c)
wins = []
for i, cs in enumerate(a_ccaps):
    sub = planes[:, :, int(offs[i]):int(offs[i]) + cs]
    wins.append(W._make_stencil_window(a_grid, cs)(sub))
cand = jnp.concatenate(wins, axis=2)                 # [3, ncells, kk]

G = max(1, min(8, 8 * 2 ** 20 // (6 * c * kk * 4)))


def fetch_kernel(cx_ref, cy_ref, cz_ref, ln_ref, out_ref):
    cx = cx_ref[...]                                  # [G, 1, kk]
    cy = cy_ref[...]
    cz = cz_ref[...]
    ln = ln_ref[...]                                  # [G, c, kcp] i32
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, kk), 2)
    outs = []
    for j in range(KCAP):                             # K extraction passes
        oh = (ln[:, :, j:j + 1] == lane_iota).astype(jnp.float32)
        outs.append(jnp.sum(oh * cx, axis=2, keepdims=True))
        outs.append(jnp.sum(oh * cy, axis=2, keepdims=True))
        outs.append(jnp.sum(oh * cz, axis=2, keepdims=True))
    res = jnp.concatenate(outs, axis=2)               # [G, c, 3K]
    out_ref[...] = jnp.pad(res, ((0, 0), (0, 0),
                                 (0, out_ref.shape[2] - 3 * KCAP)))


ow = -(-3 * KCAP // 128) * 128
pad_cells = (-ncells) % G
npc = ncells + pad_cells


def run_fetch(cand3):
    cx = cand3[0].reshape(ncells, 1, kk)
    cy = cand3[1].reshape(ncells, 1, kk)
    cz = cand3[2].reshape(ncells, 1, kk)
    if pad_cells:
        z = jnp.zeros((pad_cells, 1, kk), jnp.float32)
        cx, cy, cz = (jnp.concatenate([a, z]) for a in (cx, cy, cz))
        ln = jnp.concatenate([jnp.asarray(lanes_slot),
                              jnp.full((pad_cells, c, kcp), kk, jnp.int32)])
    else:
        ln = jnp.asarray(lanes_slot)
    out = pl.pallas_call(
        fetch_kernel,
        grid=(npc // G,),
        in_specs=[pl.BlockSpec((G, 1, kk), lambda i: (i, 0, 0))] * 3
                 + [pl.BlockSpec((G, c, kcp), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((G, c, ow), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((npc, c, ow), jnp.float32),
    )(cx, cy, cz, ln)
    return jnp.sum(out)


ms = slope_ms(lambda cry, cd: cry + 1e-9 * run_fetch(cd + cry[0]),
              (jnp.zeros((1,)), cand))
print(f'in-VMEM extraction fetch fwd (K={KCAP}): {ms:.3f} ms', flush=True)
