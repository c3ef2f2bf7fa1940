"""Angular AEV accuracy: on-chip XLA vs on-chip Pallas vs CPU f32, all
against a CPU f64 oracle on one small blocked payload."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

# Build the payload once on CPU (f32) and reuse bit-identical inputs.
import jax
if os.environ.get('NNPOPS_CPU'):
    jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from nnpops_tpu.config import ANIBasis
from nnpops_tpu.neighbors.blocked import plan_blocked_layout, build_blocked_payload
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.aev_blocked import compute_aev_blocked
from nnpops_tpu.ops.pallas_aev import angular_aev_pallas
from nnpops_tpu.utils.water import make_water_box

water = make_water_box(int(os.environ.get('NMOL', '120')), seed=0)
basis = ANIBasis.ani2x()
from nnpops_tpu.models.ani import ANIModel
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
layout = plan_blocked_layout(water.positions, water.box, model.species_array,
                             basis.radial_cutoff, basis.angular_cutoff, 7,
                             margin=1.3)
cl = CellList.create(water.box, basis.radial_cutoff,
                     capacity=layout.rad_total)
pay = build_blocked_payload(cl, jnp.asarray(water.positions),
                            jnp.asarray(water.box), model.species_array,
                            layout, basis.radial_cutoff, basis.angular_cutoff)
pay_np = jax.tree_util.tree_map(np.asarray, pay)

dev = jax.devices()[0].platform
print('backend:', dev, flush=True)

# f64 oracle via numpy (exact same formulas as aev_blocked, float64).
from nnpops_tpu.ops.aev_blocked import triple_tables
import math
t = triple_tables(layout)
d = pay_np.ang_deltas.astype(np.float64)
m = pay_np.ang_mask
r = np.sqrt((d*d).sum(-1) + (1.0 - m))
ra = basis.angular_cutoff
valid = m & (r < ra)
d1 = d[:, t.jj]; d2 = d[:, t.kk]
r1 = r[:, t.jj]; r2 = r[:, t.kk]
vv = valid[:, t.jj] & valid[:, t.kk]
dot = (d1*d2).sum(-1)
cos = np.clip(0.95*dot/(r1*r2), -0.95, 0.95)
sin = np.sqrt(1-cos*cos)
rm = 0.5*(r1+r2)
fc = lambda x: np.where(x < ra, 0.5*np.cos(math.pi*x/ra)+0.5, 0.0)
vf = vv * fc(r1) * fc(r2)
zeta = basis.angular_zeta[0]; eta = basis.angular_eta[0]
cols = np.zeros((d.shape[0], 28, 32))
for i_rs, rs in enumerate(basis.angular_rs_grid):
    e = vf*np.exp(-eta*(rm-rs)**2)
    for i_ts, ts in enumerate(basis.angular_thetas_grid):
        ctm = cos*math.cos(ts)+sin*math.sin(ts)
        w = e*(1.0+ctm)**zeta
        for seg, pid in enumerate(t.pair_ids):
            t0, t1 = t.seg_bounds[seg], t.seg_bounds[seg+1]
            cols[:, pid, i_rs*4+i_ts] += w[:, t0:t1].sum(1)
oracle = (cols * 2.0**(1-zeta)).reshape(d.shape[0], -1)

chunk = int(os.environ['CHUNK']) if os.environ.get('CHUNK') else None
ax = np.asarray(jax.jit(lambda: compute_aev_blocked(pay, basis, layout,
                                                    chunk_size=chunk).angular)())
ap = np.asarray(jax.jit(lambda: compute_aev_blocked(
    pay, basis, layout, angular_impl='pallas').angular)())
# rad-only payload + in-kernel extraction path
from nnpops_tpu.neighbors.blocked import select_blocked, payload_from_blocked
sel2 = jax.jit(lambda p: select_blocked(cl, p, jnp.asarray(water.box),
                                        model.species_array, layout,
                                        basis.radial_cutoff,
                                        basis.angular_cutoff))(
    jnp.asarray(water.positions))
pay2 = jax.jit(lambda p: payload_from_blocked(cl, p, jnp.asarray(water.box),
                                              sel2, rad_only=True))(
    jnp.asarray(water.positions))
ar = np.asarray(jax.jit(lambda: compute_aev_blocked(
    pay2, basis, layout, angular_impl='pallas').angular)())
scale = np.abs(oracle).max()
for name, v in [('xla', ax), ('pallas', ap), ('pallas-rad', ar)]:
    err = np.abs(v - oracle)
    rel = err / (np.abs(oracle) + 1e-10)
    print(f'{name}: max abs {err.max():.3e} (scale {scale:.3e}) '
          f'mean rel {rel.mean():.3e} p99 rel {np.quantile(rel, 0.99):.3e}',
          flush=True)
