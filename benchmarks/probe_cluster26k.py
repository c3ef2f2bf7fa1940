"""Cluster-pair radial vs dense-window radial at 26k on the chip."""
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
        msg = ' '.join(str(e).split(chr(10))[:3])[:400]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)
        return None


from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors.clusters import cluster_radial_features
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
SKIN = float(os.environ.get('SKIN', '0.25'))
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
base = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
cluster = base.with_blocked_layout(water.positions, water.box, margin=1.15,
                                   impl='window', skin=SKIN,
                                   radial_impl='cluster')
plan = cluster.blocked_layout.cluster_plan
print(f'plan: ncl {plan.ncl} jcaps {plan.jcaps} cand {plan.cand_caps} '
      f'kmir {plan.kmir}', flush=True)
window = base.with_blocked_layout(water.positions, water.box, margin=1.15,
                                  impl='window', skin=SKIN)
params = init_ani_params(jax.random.PRNGKey(0), basis)
box = jnp.asarray(water.box)
pos = jnp.asarray(water.positions)
clist = window.create_cell_list(water.box, skin=SKIN)

# --- selections (per refresh)
def sel_cluster(p):
    s = cluster.select(p, box, clist)
    return p + 1e-9 * (s.clusters.mirror[0, 0]
                       + s.clusters.jlists[0][0, 0]
                       + jnp.sum(s.clusters.shifts[0][:, 0, 0])
                       + s.ang.order[0] + s.tier.idx_big[0, 0])

def sel_window(p):
    s = window.select(p, box, clist)
    return p + 1e-9 * (s.ang.order[0] + s.tier.idx_big[0, 0]
                       + jnp.sum(s.shift_planes[:, 0, 0]))

timeit('select window / refresh', sel_window, pos, steps=3)
timeit('select cluster / refresh', sel_cluster, pos, steps=3)

csel = jax.jit(lambda p: cluster.select(p, box, clist))(pos)
jax.block_until_ready(csel.ang.order)
row_atom = jnp.arange(pos.shape[0], dtype=jnp.int32)

# --- radial only (fwd / fwd+bwd)
def crad_fwd(p):
    r = cluster_radial_features(p, csel.clusters, plan, basis, row_atom)
    return p + 1e-9 * jnp.sum(r) * jnp.ones((1, 3))

def crad_fwdbwd(p):
    g = jax.grad(lambda q: jnp.sum(cluster_radial_features(
        q, csel.clusters, plan, basis, row_atom) ** 2))(p)
    return p + 1e-9 * g

timeit('cluster radial fwd', crad_fwd, pos)
timeit('cluster radial fwd+bwd', crad_fwdbwd, pos)

# --- full step (select amortized over refresh 6) both modes
for name, model in (('window', window), ('cluster', cluster)):
    def step(p, model=model):
        sel = model.select(p, box, clist)
        def inner(q, _):
            e, f = model.energy_and_forces_from_selection(
                params, q, box, clist, sel)
            return q + 1e-7 * f, None
        return jax.lax.scan(inner, p, None, length=6)[0]
    timeit(f'{name} full 6-step block', step, pos, steps=1, calls=3)
print('done', flush=True)
