"""Why does the composed bench block run slower than its parts?

Parts at 26k: select 4.7/refresh + frozen step 32.5 => expected bench
~33.3 ms/step at refresh 6; measured 41.8. Suspect cross-fusion of the
select program into the scanned step body (VMEM pressure / recompute).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = 0.25
REFRESH = 6
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                     nn_dtype='bfloat16')
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
cl = model.create_cell_list(water.box, skin=SKIN)
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos0 = jnp.asarray(water.positions)


def time_block(name, use_barrier, blocks=3, calls=2):
    @jax.jit
    def run(params, positions):
        def block(pos, _):
            sel = model.select(pos, box, cl)
            if use_barrier:
                sel = jax.lax.optimization_barrier(sel)

            def step(pos, _):
                e, f = model.energy_and_forces_from_selection(
                    params, pos, box, cl, sel)
                return pos + 1e-6 * f, e
            pos, energies = jax.lax.scan(step, pos, None, length=REFRESH)
            return pos, energies
        final, energies = jax.lax.scan(block, positions, None, length=blocks)
        return final, energies

    out = run(params, pos0)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(calls):
        out = run(params, pos0)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / (calls * blocks * REFRESH) * 1e3
    print(f'{name}: {dt:.3f} ms/step', flush=True)


time_block('bench block (as-is)', False)
time_block('bench block (optimization_barrier on sel)', True)
print('done', flush=True)


def time_block_refresh(name, refresh, blocks, calls=2):
    @jax.jit
    def run(params, positions):
        def block(pos, _):
            sel = model.select(pos, box, cl)

            def step(pos, _):
                e, f = model.energy_and_forces_from_selection(
                    params, pos, box, cl, sel)
                return pos + 1e-6 * f, e
            pos, energies = jax.lax.scan(step, pos, None, length=refresh)
            return pos, energies
        final, energies = jax.lax.scan(block, positions, None, length=blocks)
        return final, energies

    out = run(params, pos0)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(calls):
        out = run(params, pos0)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / (calls * blocks * refresh) * 1e3
    print(f'{name}: {dt:.3f} ms/step', flush=True)


time_block_refresh('block refresh=18 x1', 18, 1)
time_block_refresh('block refresh=1 x6', 1, 6)

# sel as explicit jit argument, 6-step scan
sel0 = jax.jit(lambda p: model.select(p, box, cl))(pos0)
jax.block_until_ready(sel0.ang.order)


@jax.jit
def run_selarg(params, positions, sel):
    def step(pos, _):
        e, f = model.energy_and_forces_from_selection(
            params, pos, box, cl, sel)
        return pos + 1e-6 * f, e
    return jax.lax.scan(step, positions, None, length=6)


out = run_selarg(params, pos0, sel0)
jax.block_until_ready(out[0])
t0 = time.perf_counter()
for _ in range(2):
    out = run_selarg(params, pos0, sel0)
jax.block_until_ready(out[0])
print(f'sel-as-arg 6-step scan: {(time.perf_counter()-t0)/12*1e3:.3f} '
      f'ms/step', flush=True)
print('done2', flush=True)
