"""Measure full select_blocked cost (all outputs consumed) on the chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel
from nnpops_tpu.neighbors import blocked as B
from nnpops_tpu.neighbors.cell_list import CellList
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
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
species = model.species_array


def timeit(name, fn, steps=5, calls=2):
    run = jax.jit(lambda p: jax.lax.scan(
        lambda c, _: (fn(c), None), p, None, length=steps)[0])
    out = run(pos)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = run(pos)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (calls * steps) * 1e3
    print(f'{name}: {dt:.3f} ms/step', flush=True)


def consume(sel):
    # touch EVERY output so nothing is dead code
    acc = (jnp.sum(sel.nbr_rad[::97]) + jnp.sum(sel.nbr_ang[::97])
           + jnp.sum(sel.mirror[::97]) + jnp.sum(sel.ang_in_rad[::97])
           + jnp.sum(sel.rad_mask[::97]) + jnp.sum(sel.ang_mask[::97])
           + jnp.sum(sel.slot_to_atom[::97]) + jnp.sum(sel.inv_order[::97])
           + jnp.sum(sel.max_rad) + jnp.sum(sel.max_ang)
           + sel.max_cell_occupancy)
    return acc.astype(jnp.float32)


def select_full(p):
    sel = B.select_blocked(cl, p, box, species, layout,
                           basis.radial_cutoff, basis.angular_cutoff)
    return p + 1e-12 * consume(sel) * jnp.ones((1, 3))

timeit('select (ang-first single-sort)', select_full)
print('done', flush=True)
