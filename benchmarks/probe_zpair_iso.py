"""Isolate pair-radial cost at 26k: kernels vs z3/fold glue vs old window
path; plus single- vs dual-grid select under identical forcing."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses
import jax, numpy as np
import jax.numpy as jnp
from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.utils.water import make_water_box
from nnpops_tpu.neighbors.window import FAR, _make_stencil_window, select_window
from nnpops_tpu.ops.pallas_window import window_radial_aev
from nnpops_tpu.ops import pallas_zpair as Z

def timeit(fn, *a, iters=5, warm=2):
    for _ in range(warm):
        out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

water = make_water_box(8670, seed=0)
basis = ANIBasis.ani2x()
base = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                    nn_dtype='bfloat16', nn_impl='fused')
skin = 0.25
m = base.with_blocked_layout(water.positions, water.box, margin=1.15,
                             impl='window', skin=skin)
layout = m.blocked_layout
cl = m.create_cell_list(water.box, skin=skin)
box = jnp.asarray(water.box); pos = jnp.asarray(water.positions)
sel = m.select(pos, box, cl)
cell_caps = layout.cell_caps
c = sum(cell_caps); ncells = cl.num_cells; cc = ncells * c
p_w = pos - sel.wrap_shift
pos_sorted = p_w[sel.rad_order]
slots = jnp.full((cc, 3), FAR, pos.dtype).at[sel.rad_slot_of_sorted].set(pos_sorted, mode='drop')
slots = jax.block_until_ready(slots)

@jax.jit
def pair_fwd(s):
    return jnp.sum(Z.pair_radial_aev(s, box, cl.ncells, cell_caps,
                                     basis.radial_cutoff, basis.radial_eta,
                                     basis.radial_rs, basis.torchani))
@jax.jit
def pair_fb(s):
    return jax.grad(lambda q: jnp.sum(jnp.sin(Z.pair_radial_aev(
        q, box, cl.ncells, cell_caps, basis.radial_cutoff, basis.radial_eta,
        basis.radial_rs, basis.torchani))))(s)
print('pair fwd: %.2f ms' % timeit(pair_fwd, slots), flush=True)
print('pair fwd+bwd: %.2f ms' % timeit(pair_fb, slots), flush=True)

@jax.jit
def z3_fold_glue(s):
    zz = Z._build_z3(s, box, tuple(cl.ncells), cell_caps)
    return jnp.sum(zz)
print('z3 build alone: %.2f ms' % timeit(z3_fold_glue, slots), flush=True)

# old window radial for comparison
offs = np.cumsum((0,) + cell_caps)[:-1]
selw = select_window(cl, pos, box, m.species_array, layout,
                     basis.radial_cutoff, basis.angular_cutoff,
                     need_shift_planes=True)
@jax.jit
def old_fb(s_pos):
    p_w = s_pos - selw.wrap_shift
    ps = p_w[selw.rad_order]
    sl = jnp.full((cc, 3), FAR, pos.dtype).at[selw.rad_slot_of_sorted].set(ps, mode='drop')
    planes = sl.T.reshape(3, ncells, c)
    wins = []
    for i, cs in enumerate(cell_caps):
        sub = planes[:, :, int(offs[i]):int(offs[i]) + cs]
        wins.append(_make_stencil_window(tuple(cl.ncells), cs)(sub))
    win = jnp.concatenate(wins, axis=2) + selw.shift_planes
    centers = sl.reshape(ncells, c, 3)
    return jnp.sum(window_radial_aev(win[0], win[1], win[2], centers,
                   basis.radial_cutoff, basis.radial_eta, basis.radial_rs,
                   cell_caps, basis.torchani))
@jax.jit
def old_grad(s_pos):
    return jax.grad(lambda q: jnp.sum(jnp.sin(old_fb.__wrapped__(q))))(s_pos)
print('old window fwd (incl glue): %.2f ms' % timeit(old_fb, pos), flush=True)
print('old window fwd+bwd: %.2f ms' % timeit(old_grad, pos), flush=True)
