"""Round-2 chip probes: Pallas viability + payload-pipeline cost breakdown.

Times each suspect piece of the 26k step in isolation inside a scanned loop
(per-dispatch tunnel latency excluded). Run on the real TPU chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)


def timeit(name, fn, *args, steps=30, calls=2):
    run = jax.jit(lambda *a: jax.lax.scan(
        lambda c, _: (fn(*((c,) + a[1:])), None), a[0], None, length=steps)[0])
    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = run(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (calls * steps) * 1e3
    print(f'{name}: {dt:.3f} ms/step', flush=True)
    return dt


# ---- 1. Pallas viability: trivial kernel.
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + 1.0

    x = jnp.ones((256, 256), jnp.float32)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    print('pallas trivial kernel OK:', float(y[0, 0]), flush=True)
except Exception as e:
    print(f'PALLAS FAILED: {type(e).__name__}: {e}', flush=True)

# ---- 2. Pallas with grid + transcendentals (the AEV shape of work).
try:
    def kernel2(x_ref, o_ref):
        r = x_ref[:]
        o_ref[:] = jnp.exp(-0.5 * r * r) * jnp.cos(r)

    x = jnp.linspace(0, 5, 512 * 1024, dtype=jnp.float32).reshape(512, 1024)
    grid = (4,)
    y = pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((128, 1024), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 1024), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)
    print('pallas grid kernel OK:', float(y[0, 0]), flush=True)
except Exception as e:
    print(f'PALLAS GRID FAILED: {type(e).__name__}: {e}', flush=True)

# ---- 3. The packed row-gather at 26k scale ([N*K] rows from [cc, W]).
N, K, W = 26010, 80, 8
cc = 41000
rng = np.random.RandomState(0)
table = jnp.asarray(rng.rand(cc + 1, W).astype(np.float32))
idx = jnp.asarray(rng.randint(0, cc, (N, K)).astype(np.int32))


def row_gather(t, idx):
    out = t[idx.reshape(-1)].reshape(N, K, W)
    # fold back so the scan carry keeps shape [cc+1, W]
    return t + 1e-9 * jnp.sum(out) / (N * K)

timeit('[26k,80] row-gather from [41k,8]', row_gather, table, idx)

# gather gradient (scatter-add transpose)
def row_gather_grad(t, idx):
    g = jax.grad(lambda tt: jnp.sum(jnp.tanh(tt[idx.reshape(-1)])))(t)
    return t + 1e-9 * g

timeit('[26k,80] row-gather fwd+bwd', row_gather_grad, table, idx)

# ---- 4. take_along_axis [N, Ka] from [N, K] (the angular subset fetch).
Ka = 32
take = jnp.asarray(rng.randint(0, K, (N, Ka)).astype(np.int32))
payload = jnp.asarray(rng.rand(N, K).astype(np.float32))


def ta(p, take):
    out = jnp.take_along_axis(p, take, axis=1)
    return p + 1e-9 * jnp.sum(out) / out.size

timeit('[26k,32] take_along_axis from [N,80]', ta, payload, take)

# ---- 5. Current payload_from_selection at 26k (fwd only and fwd+bwd).
from nnpops_tpu.config import ANIBasis
from nnpops_tpu.native import plan_capacities
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.utils.water import make_water_box

water = make_water_box(8670, seed=0)
basis = ANIBasis.ani2x()
capacity, angular_capacity, _ = plan_capacities(
    water.positions, water.box, basis.radial_cutoff, basis.angular_cutoff,
    margin=1.15)
print(f'planned: capacity={capacity} angular={angular_capacity}', flush=True)
cl = CellList.create(water.box, basis.radial_cutoff, capacity=capacity)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
onehot = np.eye(7, dtype=np.float32)[
    np.where(np.asarray(water.atomic_numbers) == 8, 3, 0)]
onehot = jnp.asarray(onehot)
sel = jax.jit(lambda p: cl.select(p, box))(pos)
jax.block_until_ready(sel.order)


def payload_fwd(p):
    pl_ = cl.payload_from_selection(p, box, sel, onehot)
    return p + 1e-7 * jnp.sum(pl_.distances, axis=1, keepdims=True) * jnp.ones((1, 3))

timeit('payload_from_selection fwd 26k', payload_fwd, pos)


def payload_fwdbwd(p):
    g = jax.grad(lambda pp: jnp.sum(
        jnp.tanh(cl.payload_from_selection(pp, box, sel, onehot).distances)))(p)
    return p + 1e-7 * g

timeit('payload_from_selection fwd+bwd 26k', payload_fwdbwd, pos)

# ---- 6. select() cost at 26k (amortized per refresh).
def select_cost(p):
    s = cl.select(p, box)
    return p + 1e-9 * s.max_neighbors.astype(jnp.float32) * jnp.ones((1, 3))

timeit('select 26k', select_cost, pos, steps=10)

# ---- 7. AEV math from payload (current XLA path), isolated fwd+bwd.
from nnpops_tpu.ops.aev import compute_aev_from_payload

payload26 = jax.jit(lambda p: cl.payload_from_selection(p, box, sel, onehot))(pos)
jax.block_until_ready(payload26.distances)


def aev_math(p):
    pl_ = cl.payload_from_selection(p, box, sel, onehot)
    def e(d):
        pp = pl_._replace(deltas=d)
        r, a = compute_aev_from_payload(pp, basis, angular_capacity, 512)
        return jnp.sum(r) * 1e-4 + jnp.sum(a) * 1e-4
    g = jax.grad(e)(pl_.deltas)
    return p + 1e-7 * jnp.sum(g, axis=1)

timeit('payload+AEV(chunk512) fwd+bwd 26k', aev_math, pos, steps=10)
print('done', flush=True)
