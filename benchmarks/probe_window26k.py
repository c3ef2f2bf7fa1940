"""Split the window-mode 26k step into measured pieces on the chip."""
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
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors import window as W
from nnpops_tpu.neighbors.blocked import payload_from_blocked
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.pallas_aev import angular_aev_pallas
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
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
species = model.species_array
print(f'cells {cl.ncells} c {cl.cell_capacity} ang_caps {layout.ang_caps} '
      f'rad_caps {layout.rad_caps}', flush=True)

# --- select (per refresh)
def do_select(p):
    s = W.select_window(cl, p, box, species, layout, basis.radial_cutoff,
                        basis.angular_cutoff)
    return p + 1e-9 * s.ang.order[0]

timeit('select_window / refresh', do_select, pos, steps=3)

sel = jax.jit(lambda p: W.select_window(cl, p, box, species, layout,
                                        basis.radial_cutoff,
                                        basis.angular_cutoff))(pos)
jax.block_until_ready(sel.ang.order)

g = model.grouping
io_g = sel.ang.inv_order[jnp.asarray(g.order)]

# --- full window features fwd / fwd+bwd
def feat_fwd(p):
    f = W.window_features(cl, p, box, sel, basis, layout, row_order=io_g)
    return p + 1e-9 * jnp.sum(f) * jnp.ones((1, 3))


def feat_fwdbwd(p):
    gr = jax.grad(lambda q: jnp.sum(
        W.window_features(cl, q, box, sel, basis, layout,
                          row_order=io_g) ** 2))(p)
    return p + 1e-9 * gr

timeit('window features fwd', feat_fwd, pos)
timeit('window features fwd+bwd', feat_fwdbwd, pos)

# --- pieces: ang payload gather
def ang_payload_fwd(p):
    pay = payload_from_blocked(cl, p, box, sel.ang, rad_only=True,
                               row_order=io_g)
    return p + 1e-9 * jnp.sum(pay.rad_r) * jnp.ones((1, 3))


def ang_payload_fwdbwd(p):
    gr = jax.grad(lambda q: jnp.sum(payload_from_blocked(
        cl, q, box, sel.ang, rad_only=True,
        row_order=io_g).rad_r ** 2))(p)
    return p + 1e-9 * gr

timeit('ang payload fwd', ang_payload_fwd, pos)
timeit('ang payload fwd+bwd', ang_payload_fwdbwd, pos)

# --- pieces: pallas angular from fixed payload
pay = jax.jit(lambda p: payload_from_blocked(cl, p, box, sel.ang,
                                             rad_only=True,
                                             row_order=io_g))(pos)
pay = jax.tree_util.tree_map(jnp.asarray, pay)
a_layout = W.ang_as_rad_layout(layout)


def ang_kernel_fwdbwd(rd):
    gr = jax.grad(lambda x: jnp.sum(angular_aev_pallas(
        x, pay.ang_mask, basis, a_layout, rad_width=x.shape[2])))(rd)
    return rd + 1e-9 * gr

timeit('pallas angular fwd+bwd', ang_kernel_fwdbwd, pay.rad_deltas)

# --- pieces: window radial (slots build + stencil window + kernel)
ncells = cl.num_cells
c = cl.cell_capacity
cc = ncells * c
npres = len(layout.present)


def radial_fwd(p):
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
    rad = window_radial_aev(win[0] + sel.shift_planes[0],
                            win[1] + sel.shift_planes[1],
                            win[2] + sel.shift_planes[2],
                            slots.reshape(ncells, c, 3),
                            basis.radial_cutoff, basis.radial_eta,
                            basis.radial_rs, layout.cell_caps,
                            basis.torchani)
    return rad


def radial_only_fwd(p):
    return p + 1e-9 * jnp.sum(radial_fwd(p)) * jnp.ones((1, 3))


def radial_only_fwdbwd(p):
    gr = jax.grad(lambda q: jnp.sum(radial_fwd(q) ** 2))(p)
    return p + 1e-9 * gr

timeit('window radial fwd', radial_only_fwd, pos)
timeit('window radial fwd+bwd', radial_only_fwdbwd, pos)

# --- full frozen steps
def full_step(p):
    e, f = model.energy_and_forces_from_selection(params, p, box, cl, sel)
    return p + 1e-6 * f

timeit('full frozen step f32', full_step, pos)
print('done', flush=True)
