"""Probe: window radial kernel — per-grid-step overhead vs VPU math.

Times (a) the production kernel (one cell per grid step), (b) a trivial
kernel with the same grid/DMA pattern but ~no math (isolates grid + DMA
overhead), (c) a B-cells-per-step variant of the real math using 3D
[B, c, kk] blocks, for B in {2, 4, 8}.
"""
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel
from nnpops_tpu.utils.water import make_water_box

print('devices:', jax.devices(), flush=True)

water = make_water_box(8670, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
model = model.with_blocked_layout(water.positions, water.box,
                                  impl='window', skin=0.25)
layout = model.blocked_layout
cl = model.create_cell_list(water.box, skin=0.25)
print('cell grid', cl.ncells, 'cell_caps', layout.cell_caps,
      'small', layout.small_caps, 'nbig', layout.num_big_cells, flush=True)

pos = jnp.asarray(water.positions)
box = jnp.asarray(water.box)
sel = jax.jit(lambda p: model.select(p, box, cl))(pos)
jax.block_until_ready(sel.ang.order)

# Build the kernel inputs exactly as window_features does.
from nnpops_tpu.neighbors.window import _make_stencil_window
from nnpops_tpu.ops.pallas_window import FAR, window_radial_aev

ncells = cl.num_cells
cell_caps = layout.cell_caps
c = sum(cell_caps)
cc = ncells * c
offs = np.cumsum((0,) + cell_caps)[:-1]


def build_inputs(p):
    p_w = p - sel.wrap_shift
    pos_sorted = p_w[sel.ang.order]
    slots = jnp.full((cc, 3), FAR, p.dtype)
    slots = slots.at[sel.ang.slot_of_sorted].set(pos_sorted, mode='drop')
    planes = slots.T.reshape(3, ncells, c)
    wins = []
    for i, cs in enumerate(cell_caps):
        sub = planes[:, :, int(offs[i]):int(offs[i]) + cs]
        wins.append(_make_stencil_window(cl.ncells, cs)(sub))
    win = jnp.concatenate(wins, axis=2) + sel.shift_planes
    centers = slots.reshape(ncells, c, 3)
    return win, centers


win, centers = jax.jit(build_inputs)(pos)
jax.block_until_ready(win)
kk = win.shape[2]
print('ncells', ncells, 'c', c, 'kk', kk, flush=True)


def timeit(name, f, *args, iters=30):
    g = jax.jit(f)
    o = g(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = g(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f'{name}: {dt:.3f} ms', flush=True)
    return dt


# (a) production kernel fwd only and fwd+bwd.
def prod_fwd(w, ctr):
    return window_radial_aev(w[0], w[1], w[2], ctr,
                             basis.radial_cutoff, basis.radial_eta,
                             basis.radial_rs, cell_caps, basis.torchani)


def prod_fb(w, ctr):
    def loss(w, ctr):
        return jnp.sum(prod_fwd(w, ctr))
    g = jax.grad(loss, argnums=(0, 1))(w, ctr)
    return g[0][0, 0, 0] + g[1][0, 0, 0]

timeit('prod fwd', prod_fwd, win, centers)
timeit('prod fwd+bwd', prod_fb, win, centers)


# (b) trivial kernel, same grid/DMA shape: out = sum over lanes of cx.
n_r = basis.num_radial
npres = len(cell_caps)
out_w = npres * n_r


def triv_kernel(cx_ref, cy_ref, cz_ref, ctr_ref, out_ref):
    s = (jnp.sum(cx_ref[0]) + jnp.sum(cy_ref[0]) + jnp.sum(cz_ref[0])
         + jnp.sum(ctr_ref[0]))
    out_ref[0] = jnp.broadcast_to(s, out_ref.shape[1:])


def triv(w, ctr):
    def mid(x):
        return x.reshape(x.shape[0], 1, x.shape[1])
    return pl.pallas_call(
        triv_kernel,
        grid=(ncells,),
        in_specs=[pl.BlockSpec((1, 1, kk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((1, c, 3), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, out_w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncells, c, out_w), jnp.float32),
    )(mid(w[0]), mid(w[1]), mid(w[2]), ctr)

timeit('trivial same-grid kernel', triv, win, centers)


# (c) B cells per grid step, 3D [B, c, kk] math.
rc = float(basis.radial_cutoff)
rs_list = tuple(float(x) for x in basis.radial_rs)
etas = (float(basis.radial_eta[0]),) * n_r
scale = 0.25
wb = 27 * offs
sp_bounds = [(int(wb[s]), int(wb[s] + 27 * cell_caps[s]))
             for s in range(npres)]
ctr_offs = offs
sp_shift = [int(wb[s] + 13 * cell_caps[s] - ctr_offs[s])
            for s in range(npres)]
l_eta = etas[0]
l_d = rs_list[1] - rs_list[0]
l_c1 = math.exp(-l_eta * l_d * l_d)
l_c2 = l_c1 * l_c1
n_half = (n_r + 7) // 8
bounds = [(h * n_r // n_half, (h + 1) * n_r // n_half)
          for h in range(n_half)]


def iter_radial_exps(r):
    r = jnp.minimum(r, rc)
    for h0, h1 in bounds:
        s0 = (h0 + h1) // 2
        u0 = r - rs_list[s0]
        e0 = jnp.exp(-l_eta * (u0 * u0))
        t = jnp.exp((2.0 * l_eta * l_d) * u0)
        yield s0, e0
        run = t * l_c1
        cur = e0
        for q in range(s0 + 1, h1):
            cur = cur * run
            run = run * l_c2
            yield q, cur
        t_inv = 1.0 / t
        run = t_inv * l_c1
        cur = e0
        for q in range(s0 - 1, h0 - 1, -1):
            cur = cur * run
            run = run * l_c2
            yield q, cur


def make_batched(B):
    def fwd_kernel(cx_ref, cy_ref, cz_ref, ctr_ref, out_ref):
        cx = cx_ref[0][:, None, :]                     # [B, 1, kk]
        cy = cy_ref[0][:, None, :]
        cz = cz_ref[0][:, None, :]
        ctr = ctr_ref[0].reshape(B, c, 3)
        dx = cx - ctr[:, :, 0:1]
        dy = cy - ctr[:, :, 1:2]
        dz = cz - ctr[:, :, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, c, kk), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (B, c, kk), 1)
        self_lane = row + sp_shift[0]
        for s in range(1, npres):
            self_lane = jnp.where(row >= int(ctr_offs[s]),
                                  row + sp_shift[s], self_lane)
        valid = (d2 < rc * rc) & (lane != self_lane)
        r = jnp.sqrt(jnp.maximum(d2, 1e-12))
        fc = jnp.where(valid, 0.5 * jnp.cos(math.pi / rc * r) + 0.5, 0.0)
        cols = [None] * out_w
        for q, e in iter_radial_exps(r):
            we = fc * e
            for s, (b0, b1) in enumerate(sp_bounds):
                cols[s * n_r + q] = scale * jnp.sum(
                    we[:, :, b0:b1], axis=2, keepdims=True)
        out_ref[0] = jnp.concatenate(cols, axis=2).reshape(B * c, out_w)

    nb = ncells // B

    def run(w, ctr):
        def midb(x):
            return x[:nb * B].reshape(nb, B, kk)
        ctrb = ctr[:nb * B].reshape(nb, B * c, 3)
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb,),
            in_specs=[pl.BlockSpec((1, B, kk), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 3
            + [pl.BlockSpec((1, B * c, 3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, B * c, out_w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, B * c, out_w), jnp.float32),
        )(midb(w[0]), midb(w[1]), midb(w[2]), ctrb)
    return run

for B in (2, 4, 8):
    if ncells % B:
        print(f'B={B}: skipped (ncells {ncells} not divisible)', flush=True)
        continue
    try:
        timeit(f'batched fwd B={B}', make_batched(B), win, centers)
    except Exception as e:
        print(f'B={B}: FAILED {type(e).__name__}: {str(e)[:200]}', flush=True)
print('done', flush=True)
