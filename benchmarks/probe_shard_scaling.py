"""Scaling curve of the sharded window pipeline on the virtual CPU mesh
(VERDICT r3 item 5): energy+forces at 2.6k atoms on 1/2/4/8 devices vs the
single-device fast path.

CPU-mesh caveat recorded with the numbers: virtual devices share one host
core here, so the curve measures WORK DIVISION + collective overhead, not
ICI bandwidth — per-step wall time should stay ~flat as devices increase
(same total work, more overhead), and the interesting signals are (a) how
far the sharded step's TOTAL work sits above the single-device path (the
two documented deviations: plain scatter-add gather adjoint, no occupancy
bucketing) and (b) that the collective structure compiles and runs at
production shapes.
"""
import os
import time

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.parallel.sharding import make_mesh
from nnpops_tpu.parallel.window_shard import window_sharded_energy
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '867'))
REPS = int(os.environ.get('REPS', '5'))

water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
model = model.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=0.25)
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
clist = model.create_cell_list(water.box, skin=0.25)
sel = jax.jit(lambda p: model.select(p, box, clist))(pos)
jax.block_until_ready(sel.ang.order)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


ef_single = jax.jit(lambda p, x: model.energy_and_forces_from_selection(
    p, x, box, clist, sel))
ms, (e0, f0) = timeit(ef_single, params, pos)
print(f'single-device fast path: {ms:8.1f} ms  (E = {float(e0):.6f})',
      flush=True)

for dsz in (1, 2, 4, 8):
    mesh = make_mesh(dsz, model_parallel=1)
    fn = window_sharded_energy(model, mesh, axis='dp')
    vg = jax.jit(jax.value_and_grad(lambda p, x: fn(p, x, box, sel),
                                    argnums=1))
    ms, (e, g) = timeit(vg, params, pos)
    rel = abs(float(e) - float(e0)) / abs(float(e0))
    fmax = float(np.abs(np.asarray(-g) - np.asarray(f0)).max())
    scale = float(np.abs(np.asarray(f0)).max())
    print(f'sharded {dsz} dev: {ms:8.1f} ms  E rel err {rel:.2e}  '
          f'F max err/scale {fmax / scale:.2e}', flush=True)
