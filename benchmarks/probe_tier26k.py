"""Tiered window-mode 26k step pieces (the production bench path)."""
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
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                     nn_dtype='bfloat16')
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
layout = model.blocked_layout
cl = model.create_cell_list(water.box, skin=SKIN)
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
print(f'ang_small {layout.ang_small_caps} big_rows {layout.ang_big_rows} '
      f'cell small {layout.small_caps} nbig {layout.num_big_cells}',
      flush=True)


def do_select(p):
    s = model.select(p, box, cl)
    return p + 1e-9 * s.ang.order[0]

timeit('select (with tier build) / refresh', do_select, pos, steps=3)

sel = jax.jit(lambda p: model.select(p, box, cl))(pos)
jax.block_until_ready(sel.ang.order)

t = sel.tier
print('tier rows big', t.idx_big.shape, 'small', t.idx_small.shape,
      flush=True)

cc = cl.num_cells * cl.cell_capacity


# Tiered gather alone
def gather_fwdbwd(p):
    def loss(q):
        pos_sorted = q[sel.ang.order]
        slots = jnp.zeros((cc + 2, 3), q.dtype)
        slots = slots.at[sel.ang.slot_of_sorted].set(pos_sorted, mode='drop')
        ob, os_ = W._tiered_gather(slots, t.idx_big, t.idx_small, t.mir_big,
                                   t.mir_small, t.mask_big, t.mask_small,
                                   t.slot_rows_big, t.slot_rows_small)
        return jnp.sum(ob ** 2) + jnp.sum(os_ ** 2)
    g = jax.grad(loss)(p)
    return p + 1e-9 * g

timeit('tiered ang gather fwd+bwd', gather_fwdbwd, pos)


# Tiered angular (gather + both kernels)
def tier_ang_fwdbwd(p):
    def loss(q):
        _, ang = W._tiered_angular(cl, q, box, sel, basis, layout, cc, None)
        return jnp.sum(ang ** 2)
    g = jax.grad(loss)(p)
    return p + 1e-9 * g

timeit('tiered angular total fwd+bwd', tier_ang_fwdbwd, pos)


# Full features / full step
def feat_fwdbwd(p):
    gr = jax.grad(lambda q: jnp.sum(W.window_features(
        cl, q, box, sel, basis, layout) ** 2))(p)
    return p + 1e-9 * gr

timeit('window features (tier) fwd+bwd', feat_fwdbwd, pos)


def full_step(p):
    e, f = model.energy_and_forces_from_selection(params, p, box, cl, sel)
    return p + 1e-6 * f

timeit('full frozen step (tier, bf16)', full_step, pos)
print('done', flush=True)
