"""Bisect the 26k step: payload / AEV fwd / AEV bwd / NN fwd / NN fwd+bwd /
full step. Run on the real chip."""
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
        msg = ' '.join(str(e).split(chr(10))[:2])[:200]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)
        return None


from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.native import plan_capacities
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.aev import compute_aev_from_payload
from nnpops_tpu.ops.batched_nn import ensemble_energy
from nnpops_tpu.utils.water import make_water_box

water = make_water_box(8670, seed=0)
basis = ANIBasis.ani2x()
capacity, angular_capacity, _ = plan_capacities(
    water.positions, water.box, basis.radial_cutoff, basis.angular_cutoff,
    margin=1.15)
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                     angular_capacity=angular_capacity,
                                     aev_chunk_size=512)
params = init_ani_params(jax.random.PRNGKey(0), basis)
cl = CellList.create(water.box, basis.radial_cutoff, capacity=capacity)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
n = pos.shape[0]
sel = jax.jit(lambda p: cl.select(p, box))(pos)
jax.block_until_ready(sel.order)
onehot = jnp.asarray(model.species_onehot)

# --- NN alone on a fixed random AEV.
aev = jax.random.normal(jax.random.PRNGKey(1), (n, basis.aev_length),
                        jnp.float32) * 0.1
grouping = model.grouping


def nn_fwd(a):
    e = ensemble_energy(params.ensemble, a, grouping)
    return a + 1e-9 * e

timeit('NN fwd 26k', nn_fwd, aev)


def nn_fwdbwd(a):
    g = jax.grad(lambda x: ensemble_energy(params.ensemble, x, grouping))(a)
    return a + 1e-3 * g

timeit('NN fwd+bwd(aev) 26k', nn_fwdbwd, aev)

# --- AEV fwd only (payload + AEV math, no grad).
def aev_fwd(p):
    pay = cl.payload_from_selection(p, box, sel, onehot)
    r, a = compute_aev_from_payload(pay, basis, angular_capacity, 512)
    return p + 1e-9 * (jnp.sum(r) + jnp.sum(a)) * jnp.ones((1, 3))

timeit('payload+AEV fwd 26k', aev_fwd, pos)

# --- full energy fwd.
def e_fwd(p):
    e = model.energy_from_selection(params, p, box, cl, sel)
    return p + 1e-9 * e * jnp.ones((1, 3))

timeit('energy fwd 26k', e_fwd, pos)

# --- full energy+forces (the bench step).
def ef(p):
    e, f = model.energy_and_forces_from_selection(params, p, box, cl, sel)
    return p + 1e-6 * f

timeit('energy+forces 26k', ef, pos)

# --- energy+forces without chunking (chunk=None).
model_nc = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                        angular_capacity=angular_capacity,
                                        aev_chunk_size=None)

def ef_nc(p):
    e, f = model_nc.energy_and_forces_from_selection(params, p, box, cl, sel)
    return p + 1e-6 * f

timeit('energy+forces 26k nochunk', ef_nc, pos)
print('done', flush=True)
