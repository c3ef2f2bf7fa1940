"""float64 dtype support (subprocess: jax_enable_x64 is process-global).

The reference dispatches both float32 and float64 through every op
(getNeighborPairsCUDA.cu:141/:183 AT_DISPATCH; pmeCPU computes in double).
Here float64 rides JAX's x64 mode: these tests run a child interpreter with
``JAX_ENABLE_X64=1`` and assert (a) dtype propagation — f64 in, f64 out —
and (b) accuracy beyond f32: the PME golden comparisons tighten from the
f32 suite's rtol 1e-4 to 1e-5 (bounded by the f32-stored fixture positions).
"""
import os
import pathlib
import subprocess
import sys

import pytest

REPO = str(pathlib.Path(__file__).resolve().parents[1])

SCRIPT = r'''
import os, sys
os.environ['JAX_ENABLE_X64'] = '1'
os.environ['JAX_PLATFORMS'] = 'cpu'
sys.path.insert(0, {repo!r})
sys.path.insert(0, {tests!r})
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np

# --- getNeighborPairs: f64 in -> f64 out, distances match a numpy f64
# oracle to double precision (reference dtype dispatch,
# getNeighborPairsCUDA.cu:141).
from nnpops_tpu.neighbors.pairs import get_neighbor_pairs
rng = np.random.default_rng(0)
pos = (rng.random((64, 3)) * 8.0).astype(np.float64)
res = get_neighbor_pairs(jnp.asarray(pos), 3.0)
assert res.deltas.dtype == jnp.float64, res.deltas.dtype
assert res.distances.dtype == jnp.float64
d = pos[:, None, :] - pos[None, :, :]
dist = np.sqrt((d * d).sum(-1))
iu = np.tril_indices(64, -1)
oracle = dist[iu]
got = np.asarray(res.distances)
mask = ~np.isnan(got)
ref = np.where(oracle <= 3.0, oracle, np.nan)
# rows enumerate the same triangular order
assert mask.sum() == (oracle <= 3.0).sum()
np.testing.assert_allclose(got[mask], oracle[oracle <= 3.0], rtol=1e-14)

# --- AEV: f64 golden values (same tolerances as f32 — the golden data is
# itself f32 — plus the dtype check).
from nnpops_tpu.config import ANIBasis
from nnpops_tpu.ops.aev import compute_aev
g = dict(np.load(os.path.join({tests!r}, 'data', 'golden_ani_water.npz')))
rp, ap = g['radial_params'], g['angular_params']
basis = ANIBasis(
    num_species=2, radial_cutoff=4.5, angular_cutoff=3.5,
    radial_eta=tuple(rp[:, 0].tolist()), radial_rs=tuple(rp[:, 1].tolist()),
    angular_eta=tuple(ap[:, 0].tolist()),
    angular_rs=tuple(ap[:, 1].tolist()),
    angular_zeta=tuple(ap[:, 2].tolist()),
    angular_thetas=tuple(ap[:, 3].tolist()), torchani=True)
positions = jnp.asarray(np.asarray(g['positions'], np.float64))
species = jnp.asarray(g['species'])
radial, angular = compute_aev(positions, species, basis,
                              box=jnp.asarray(np.asarray(g['periodic_box'],
                                                         np.float64)))
assert radial.dtype == jnp.float64
exp_r, exp_a = g['periodic_radial'].ravel(), g['periodic_angular'].ravel()
for got_v, exp in ((np.asarray(radial).ravel(), exp_r),
                   (np.asarray(angular).ravel(), exp_a)):
    diff = np.abs(exp - got_v)
    bad = (diff > 1e-4) & (diff / np.maximum(np.abs(exp), 1e-30) > 1e-3)
    assert not bad.any()

# --- PME: OpenMM golden values at rtol 1e-6 (pmeCPU computes in double;
# fixtures from the reference TestPme.py).
from nnpops_tpu.ops.pme import PME
from test_pme import BOX_RECT, CHARGES, NO_EXCL, POS_RECT
pme = PME(14, 15, 16, 5, 4.985823141035867, 138.935, NO_EXCL)
p64 = jnp.asarray(np.asarray(POS_RECT, np.float64))
q64 = jnp.asarray(np.asarray(CHARGES, np.float64))
b64 = jnp.asarray(np.asarray(BOX_RECT, np.float64))
edir = pme.compute_direct(p64, q64, 0.5, b64)
assert edir.dtype == jnp.float64
# rtol bound: POS_RECT is stored f32 (~1e-7 position error ->
# ~1e-5 energy error); still 10x tighter than the f32 suite.
np.testing.assert_allclose(float(edir), 0.5811535194516182, rtol=1e-5)
erec = pme.compute_reciprocal(p64, q64, b64)
assert erec.dtype == jnp.float64
np.testing.assert_allclose(float(erec), -90.92361028496651, rtol=1e-5)
f = jax.grad(lambda p: pme.compute_direct(p, q64, 0.5, b64))(p64)
assert f.dtype == jnp.float64
print('OK')
'''


@pytest.mark.slow
def test_float64_subprocess():
    script = SCRIPT.format(repo=REPO, tests=os.path.join(REPO, 'tests'))
    env = {k: v for k, v in os.environ.items() if not k.startswith('XLA_')}
    env['JAX_ENABLE_X64'] = '1'
    env['JAX_PLATFORMS'] = 'cpu'
    out = subprocess.run([sys.executable, '-c', script], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert 'OK' in out.stdout
