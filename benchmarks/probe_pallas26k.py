"""On-chip parity (XLA blocked vs Pallas angular) + 26k perf of the real
Mosaic kernel."""
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
from nnpops_tpu.ops.aev_blocked import compute_aev_blocked
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
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
sel = jax.jit(lambda p: model.select(p, box, cl))(pos)
jax.block_until_ready(sel.order)

# ---- On-chip parity: XLA blocked angular vs Pallas angular.
pay = jax.jit(lambda p: payload_from_blocked(cl, p, box, sel))(pos)
ax = jax.jit(lambda: compute_aev_blocked(pay, basis, layout,
                                         chunk_size=512).angular)()
ap = jax.jit(lambda: compute_aev_blocked(pay, basis, layout,
                                         angular_impl='pallas').angular)()
ax, ap = np.asarray(ax), np.asarray(ap)
denom = np.abs(ax) + 1e-6
rel = np.abs(ap - ax) / denom
print(f'parity angular: max abs {np.abs(ap-ax).max():.3e} '
      f'max rel {rel.max():.3e} mean rel {rel.mean():.3e}', flush=True)

# grad parity
def e_x(p):
    pp = payload_from_blocked(cl, p, box, sel)
    r, a = compute_aev_blocked(pp, basis, layout, chunk_size=512)
    return jnp.sum(r) * 1e-4 + jnp.sum(a) * 1e-4

def e_p(p):
    pp = payload_from_blocked(cl, p, box, sel)
    r, a = compute_aev_blocked(pp, basis, layout, angular_impl='pallas')
    return jnp.sum(r) * 1e-4 + jnp.sum(a) * 1e-4

gx = np.asarray(jax.jit(jax.grad(e_x))(pos))
gp = np.asarray(jax.jit(jax.grad(e_p))(pos))
scale = np.abs(gx).max()
print(f'parity grad: max abs diff {np.abs(gp-gx).max():.3e} '
      f'(scale {scale:.3e}, rel {np.abs(gp-gx).max()/scale:.3e})', flush=True)

# ---- Perf.
def aev_pallas_fwd(p):
    pp = payload_from_blocked(cl, p, box, sel)
    r, a = compute_aev_blocked(pp, basis, layout, angular_impl='pallas')
    return p + 1e-9 * (jnp.sum(r) + jnp.sum(a)) * jnp.ones((1, 3))

timeit('pallas payload+AEV fwd', aev_pallas_fwd, pos)


def aev_pallas_fwdbwd(p):
    g = jax.grad(e_p)(p)
    return p + 1e-7 * g

timeit('pallas payload+AEV fwd+bwd', aev_pallas_fwdbwd, pos)


def ef_pallas(p):
    e, f = model.energy_and_forces_from_selection(params, p, box, cl, sel)
    return p + 1e-6 * f

timeit('pallas energy+forces', ef_pallas, pos)
print('done', flush=True)


# ---- bf16 ensemble NN (f32 accumulate).
from nnpops_tpu.ops.batched_nn import ensemble_energy
aev = jax.random.normal(jax.random.PRNGKey(1),
                        (pos.shape[0], basis.aev_length), jnp.float32) * 0.1
grouping = model.grouping


def nn_bf16(a):
    g = jax.grad(lambda x: ensemble_energy(params.ensemble, x, grouping,
                                           jnp.bfloat16))(a)
    return a + 1e-3 * g

timeit('NN bf16 fwd+bwd(aev)', nn_bf16, aev)

gx16 = np.asarray(jax.jit(jax.grad(lambda x: ensemble_energy(
    params.ensemble, x, grouping, jnp.bfloat16)))(aev))
gx32 = np.asarray(jax.jit(jax.grad(lambda x: ensemble_energy(
    params.ensemble, x, grouping)))(aev))
scale = np.abs(gx32).max()
print(f'NN bf16 grad max abs diff {np.abs(gx16-gx32).max():.3e} '
      f'(scale {scale:.3e})', flush=True)
print('done2', flush=True)
