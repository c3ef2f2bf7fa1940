"""Split the frozen-selection 26k step into measured pieces on the chip."""
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
from nnpops_tpu.neighbors import blocked as B
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.aev_blocked import compute_aev_blocked
from nnpops_tpu.ops.batched_nn import ensemble_energy
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
species = model.species_array
grouping = model.grouping

sel = jax.jit(lambda p: B.select_blocked(cl, p, box, species, layout,
                                         basis.radial_cutoff,
                                         basis.angular_cutoff))(pos)
jax.block_until_ready(sel.order)

# --- NN alone (f32 and bf16), new model-major layout.
aev = jax.random.normal(jax.random.PRNGKey(1),
                        (pos.shape[0], basis.aev_length), jnp.float32) * 0.1


def nn_f32_fwd(a):
    e = ensemble_energy(params.ensemble, a, grouping)
    return a + 1e-9 * e


def nn_f32(a):
    g = jax.grad(lambda x: ensemble_energy(params.ensemble, x, grouping))(a)
    return a + 1e-3 * g


def nn_bf16(a):
    g = jax.grad(lambda x: ensemble_energy(params.ensemble, x, grouping,
                                           jnp.bfloat16))(a)
    return a + 1e-3 * g

timeit('NN f32 fwd', nn_f32_fwd, aev)
timeit('NN f32 fwd+bwd', nn_f32, aev)
timeit('NN bf16 fwd+bwd', nn_bf16, aev)

# --- payload gather alone (rad-only), fwd and fwd+bwd.
def payload_fwd(p):
    pay = B.payload_from_blocked(cl, p, box, sel, rad_only=True)
    return p + 1e-9 * jnp.sum(pay.rad_r) * jnp.ones((1, 3))


def payload_fwdbwd(p):
    g = jax.grad(lambda q: jnp.sum(
        B.payload_from_blocked(cl, q, box, sel, rad_only=True).rad_r ** 2))(p)
    return p + 1e-9 * g

timeit('payload rad-only fwd', payload_fwd, pos)
timeit('payload rad-only fwd+bwd', payload_fwdbwd, pos)

# --- AEV from a fixed payload: radial only, pallas angular only.
pay = jax.jit(lambda p: B.payload_from_blocked(cl, p, box, sel,
                                               rad_only=True))(pos)
pay = jax.tree_util.tree_map(jnp.asarray, pay)


def radial_only(rd):
    pay2 = B.BlockedPayload(rd, pay.rad_r, pay.rad_mask, None, None,
                            pay.ang_mask, pay.max_rad, pay.max_ang,
                            pay.max_cell_occupancy, pay.ang_in_rad)
    # radial block only: slice compute_aev_blocked's radial part by calling
    # with a basis that has an empty angular set? Just compute full and take
    # radial - no; instead compute radial by hand here (same code path).
    from nnpops_tpu.geometry import cosine_cutoff
    rc = basis.radial_cutoff
    r_eta = jnp.asarray(basis.radial_eta)
    r_rs = jnp.asarray(basis.radial_rs)
    mask = pay2.rad_mask & (pay2.rad_r < rc)
    safe_r = jnp.where(mask, pay2.rad_r, 1.0)
    fc = cosine_cutoff(safe_r, rc)
    shifted = safe_r[..., None] - r_rs
    radial_pair = fc[..., None] * jnp.exp(-r_eta * shifted * shifted)
    radial_pair = jnp.where(mask[..., None], radial_pair, 0.0)
    cols = []
    for i, sp in enumerate(layout.present):
        off = layout.rad_offsets[i]
        k = layout.rad_caps[i]
        cols.append(jnp.sum(radial_pair[:, off:off + k, :], axis=1))
    radial = jnp.stack(cols, axis=1)
    return rd + 1e-9 * jnp.sum(radial)


def radial_grad(rd):
    g = jax.grad(lambda x: jnp.sum(radial_only(x)))(rd)
    return rd + 1e-9 * g

timeit('radial XLA fwd(from payload)', radial_only, pay.rad_deltas)
timeit('radial XLA fwd+bwd', radial_grad, pay.rad_deltas)


def ang_fwd(rd):
    from nnpops_tpu.ops.pallas_aev import angular_aev_pallas
    a = angular_aev_pallas(rd, pay.ang_mask, basis, layout,
                           rad_width=rd.shape[2])
    return rd + 1e-9 * jnp.sum(a)


def ang_fwdbwd(rd):
    from nnpops_tpu.ops.pallas_aev import angular_aev_pallas
    g = jax.grad(lambda x: jnp.sum(angular_aev_pallas(
        x, pay.ang_mask, basis, layout, rad_width=x.shape[2])))(rd)
    return rd + 1e-9 * g

timeit('pallas angular fwd', ang_fwd, pay.rad_deltas)
timeit('pallas angular fwd+bwd', ang_fwdbwd, pay.rad_deltas)

# --- full frozen step for reference
def full_step(p):
    e, f = model.energy_and_forces_from_selection(params, p, box, cl, sel)
    return p + 1e-6 * f

timeit('full frozen step', full_step, pos)


def full_step_bf16(p):
    import dataclasses
    m2 = dataclasses.replace(model, nn_dtype='bfloat16')
    e, f = m2.energy_and_forces_from_selection(params, p, box, cl, sel)
    return p + 1e-6 * f

timeit('full frozen step (nn bf16)', full_step_bf16, pos)
print('done', flush=True)
