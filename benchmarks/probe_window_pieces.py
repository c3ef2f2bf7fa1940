"""Window radial: kernel-only vs XLA-glue costs; ang-payload layout A/B."""
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
from nnpops_tpu.neighbors import window as W
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.pallas_window import FAR, window_radial_aev
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
layout = model.blocked_layout
cl = model.create_cell_list(water.box, skin=SKIN)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
species = model.species_array

sel = jax.jit(lambda p: W.select_window(cl, p, box, species, layout,
                                        basis.radial_cutoff,
                                        basis.angular_cutoff))(pos)
jax.block_until_ready(sel.ang.order)

ncells = cl.num_cells
c = cl.cell_capacity
cc = ncells * c
npres = len(layout.present)

# Fixed window inputs (kernel-only timing); nudge candx to stay
# data-dependent through the scan carry.
def build_inputs(p):
    p_w = p - sel.wrap_shift
    pos_sorted = p_w[sel.ang.order]
    slots = jnp.full((cc, 3), FAR, p.dtype)
    slots = slots.at[sel.ang.slot_of_sorted].set(pos_sorted, mode='drop')
    planes = slots.T.reshape(3, ncells, c)
    import numpy as _np
    offs = _np.cumsum((0,) + layout.cell_caps)[:-1]
    wins = [W._make_stencil_window(cl.ncells, cs)(
        planes[:, :, int(offs[i]):int(offs[i]) + cs])
        for i, cs in enumerate(layout.cell_caps)]
    win = jnp.concatenate(wins, axis=2)
    return (win[0] + sel.shift_planes[0], win[1] + sel.shift_planes[1],
            win[2] + sel.shift_planes[2], slots.reshape(ncells, c, 3))

candx, candy, candz, centers = jax.jit(build_inputs)(pos)
jax.block_until_ready(candx)


def kernel_fwd(cx):
    rad = window_radial_aev(cx, candy, candz, centers,
                            basis.radial_cutoff, basis.radial_eta,
                            basis.radial_rs, layout.cell_caps, basis.torchani)
    return cx + 1e-9 * jnp.sum(rad)


def kernel_fwdbwd(cx):
    def loss(x):
        rad = window_radial_aev(x, candy, candz, centers,
                                basis.radial_cutoff, basis.radial_eta,
                                basis.radial_rs, layout.cell_caps,
                                basis.torchani)
        return jnp.sum(rad ** 2)
    g = jax.grad(loss)(cx)
    return cx + 1e-9 * g

timeit('window kernel fwd only', kernel_fwd, candx)
timeit('window kernel fwd+bwd', kernel_fwdbwd, candx)


# XLA glue alone: slots scatter + transpose + stencil window + shift.
def glue_fwd(p):
    cx, cy, cz, ctr = build_inputs(p)
    return p + 1e-9 * (jnp.sum(cx * cy) + jnp.sum(ctr)) * jnp.ones((1, 3))


def glue_fwdbwd(p):
    def loss(q):
        cx, cy, cz, ctr = build_inputs(q)
        return jnp.sum(cx * cy) + jnp.sum(ctr ** 2)
    g = jax.grad(loss)(p)
    return p + 1e-9 * g

timeit('glue fwd (slots+window+shift)', glue_fwd, pos)
timeit('glue fwd+bwd', glue_fwdbwd, pos)


# Ang payload gather A/B: plane-transposed mirror vs packed [N,K,3] style.
from nnpops_tpu.neighbors.blocked import _gather_slots_mirror

idx = sel.ang.nbr_rad
mask = sel.ang.rad_mask
mirror = sel.ang.mirror
slot_rows = sel.ang.slot_of_sorted
n, kb = idx.shape
print(f'ang lanes {kb}', flush=True)


def mk_slots(p):
    p_sorted = p[sel.ang.order]
    slots = jnp.zeros((cc + 1, 3), p.dtype)
    return slots.at[slot_rows].set(p_sorted, mode='drop'), p_sorted


def planes_fwdbwd(p):
    def loss(q):
        slots, _ = mk_slots(q)
        g3 = _gather_slots_mirror(slots, idx, mirror, mask, slot_rows)
        return jnp.sum(g3 ** 2)
    g = jax.grad(loss)(p)
    return p + 1e-9 * g

timeit('mirror gather planes fwd+bwd', planes_fwdbwd, pos)


@jax.custom_vjp
def gather_packed(slots):
    return slots[idx.reshape(-1)].reshape(n, kb, 3)


def gather_packed_fwd(slots):
    return gather_packed(slots), ()


def gather_packed_bwd(_, g):
    g_flat = jnp.concatenate([g.reshape(n * kb, 3),
                              jnp.zeros((1, 3), g.dtype)], axis=0)
    gm = g_flat[mirror.reshape(-1)].reshape(n, kb, 3)
    gm = jnp.where(mask[..., None], gm, 0.0)
    per_atom = jnp.sum(gm, axis=1)
    d_slots = jnp.zeros((cc + 1, 3), g.dtype)
    return (d_slots.at[slot_rows].set(per_atom, mode='drop'),)


gather_packed.defvjp(gather_packed_fwd, gather_packed_bwd)


def packed_fwdbwd(p):
    def loss(q):
        slots, _ = mk_slots(q)
        return jnp.sum(gather_packed(slots) ** 2)
    g = jax.grad(loss)(p)
    return p + 1e-9 * g

timeit('mirror gather packed fwd+bwd', packed_fwdbwd, pos)
print('done', flush=True)
