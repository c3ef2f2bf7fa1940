"""Measure the species-blocked AEV pipeline at 26k atoms on the chip."""
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
from nnpops_tpu.neighbors.blocked import payload_from_blocked
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.aev_blocked import (build_triple_tables,
                                        compute_aev_blocked, triple_tables)
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
CHUNK = os.environ.get('CHUNK')
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
t0 = time.time()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                     aev_chunk_size=int(CHUNK) if CHUNK else None)
model = model.with_blocked_layout(water.positions, water.box, margin=1.15)
layout = model.blocked_layout
tables = triple_tables(layout)
print(f'layout planned in {time.time()-t0:.1f}s: present={layout.present} '
      f'rad={layout.rad_caps} ang={layout.ang_caps} T={len(tables.jj)}',
      flush=True)
cl = CellList.create(water.box, basis.radial_cutoff,
                     capacity=layout.rad_total)
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)

sel = jax.jit(lambda p: model.select(p, box, cl))(pos)
jax.block_until_ready(sel.order)


def select_cost(p):
    s = model.select(p, box, cl)
    return p + 1e-9 * s.max_rad[0].astype(jnp.float32) * jnp.ones((1, 3))

timeit('blocked select 26k', select_cost, pos, steps=5)


def payload_fwd(p):
    pay = payload_from_blocked(cl, p, box, sel)
    return p + 1e-7 * jnp.sum(pay.rad_r, axis=1, keepdims=True) * jnp.ones((1, 3))

timeit('blocked payload fwd', payload_fwd, pos)


def payload_fwdbwd(p):
    g = jax.grad(lambda pp: jnp.sum(
        jnp.tanh(payload_from_blocked(cl, pp, box, sel).rad_r)))(p)
    return p + 1e-7 * g

timeit('blocked payload fwd+bwd', payload_fwdbwd, pos)


def aev_fwd(p):
    pay = payload_from_blocked(cl, p, box, sel)
    r, a = compute_aev_blocked(pay, basis, layout, model.aev_chunk_size)
    return p + 1e-9 * (jnp.sum(r) + jnp.sum(a)) * jnp.ones((1, 3))

timeit('blocked payload+AEV fwd', aev_fwd, pos)


def aev_fwdbwd(p):
    def e(pp):
        pay = payload_from_blocked(cl, pp, box, sel)
        r, a = compute_aev_blocked(pay, basis, layout, model.aev_chunk_size)
        return jnp.sum(r) * 1e-4 + jnp.sum(a) * 1e-4
    g = jax.grad(e)(p)
    return p + 1e-7 * g

timeit('blocked payload+AEV fwd+bwd', aev_fwdbwd, pos)


def ef(p):
    e, f = model.energy_and_forces_from_selection(params, p, box, cl, sel)
    return p + 1e-6 * f

timeit('blocked energy+forces', ef, pos)
print('done', flush=True)


# ---- Pallas angular kernel path.
pmodel = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
pmodel = pmodel.with_blocked_layout(water.positions, water.box, margin=1.15,
                                    impl='pallas')


def aev_pallas_fwd(p):
    pay = payload_from_blocked(cl, p, box, sel)
    r, a = compute_aev_blocked(pay, basis, pmodel.blocked_layout,
                               angular_impl='pallas')
    return p + 1e-9 * (jnp.sum(r) + jnp.sum(a)) * jnp.ones((1, 3))

timeit('pallas payload+AEV fwd', aev_pallas_fwd, pos)


def aev_pallas_fwdbwd(p):
    def e(pp):
        pay = payload_from_blocked(cl, pp, box, sel)
        r, a = compute_aev_blocked(pay, basis, pmodel.blocked_layout,
                                   angular_impl='pallas')
        return jnp.sum(r) * 1e-4 + jnp.sum(a) * 1e-4
    g = jax.grad(e)(p)
    return p + 1e-7 * g

timeit('pallas payload+AEV fwd+bwd', aev_pallas_fwdbwd, pos)


def ef_pallas(p):
    e, f = pmodel.energy_and_forces_from_selection(params, p, box, cl, sel)
    return p + 1e-6 * f

timeit('pallas energy+forces', ef_pallas, pos)
print('done pallas', flush=True)
