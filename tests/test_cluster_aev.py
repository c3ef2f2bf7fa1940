"""Cluster-pair radial path (species-pure 8-atom clusters + compacted
j-cluster lists, ops.pallas_cluster / neighbors.clusters): parity against
the dense-window radial, wrap invariance, sticky-selection reuse, and the
capacity-overflow contract."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# The cluster radial path is correctness-kept but off by default (measured
# slower than the window kernels, NOTES_PERF r2); its 1300-molecule fixtures
# cost ~14 min of the 1-CPU quick gate. Full-lane coverage only.
pytestmark = pytest.mark.slow

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors.clusters import plan_clusters, select_clusters
from nnpops_tpu.utils.water import make_water_box


@pytest.fixture(scope='module')
def setup():
    # Cluster mode needs a box comfortably above 2*(2*half_extent + rc)
    # (single-image shift validity); 1300 molecules ~ 34 A.
    water = make_water_box(1300, seed=0)
    basis = ANIBasis.ani2x()
    base = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
    window = base.with_blocked_layout(water.positions, water.box,
                                      impl='window')
    cluster = base.with_blocked_layout(water.positions, water.box,
                                       impl='window', radial_impl='cluster')
    assert window.aev_impl == 'window'
    assert cluster.window_radial == 'cluster'
    assert cluster.blocked_layout.cluster_plan is not None
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    cl = window.create_cell_list(water.box)
    return water, window, cluster, params, cl


def test_cluster_energy_forces_match_window(setup):
    water, window, cluster, params, cl = setup
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    e1, f1 = window.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = cluster.energy_and_forces_fused(params, pos, box, cl)
    np.testing.assert_allclose(e2, e1, rtol=1e-5)
    scale = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(f2, f1, rtol=2e-4, atol=2e-5 * scale)


def test_cluster_wrap_invariance(setup):
    water, window, cluster, params, cl = setup
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    rng = np.random.RandomState(3)
    shifts = rng.randint(-2, 3, (pos.shape[0], 3)).astype(np.float32)
    pos2 = pos + jnp.asarray(shifts) @ box
    e1, f1 = cluster.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = cluster.energy_and_forces_fused(params, pos2, box, cl)
    np.testing.assert_allclose(e2, e1, rtol=1e-6)
    scale = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(f2, f1, rtol=1e-3, atol=1e-4 * scale)


def test_cluster_sticky_selection_reuse(setup):
    """A frozen cluster selection stays valid for drifted positions within
    the Verlet-skin contract."""
    water, _, _, params, _ = setup
    skin = 0.3
    basis = ANIBasis.ani2x()
    cluster = ANIModel.from_atomic_numbers(
        water.atomic_numbers, basis).with_blocked_layout(
            water.positions, water.box, impl='window', skin=skin,
            radial_impl='cluster')
    cl = cluster.create_cell_list(water.box, skin=skin)
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    sel = cluster.select(pos, box, cl)
    rng = np.random.RandomState(5)
    drift = jnp.asarray(rng.uniform(-1, 1, pos.shape).astype(np.float32)
                        * (skin / 2 / np.sqrt(3)) * 0.9)
    pos2 = pos + drift
    e_frozen, f_frozen = cluster.energy_and_forces_from_selection(
        params, pos2, box, cl, sel)
    sel2 = cluster.select(pos2, box, cl)
    e_fresh, f_fresh = cluster.energy_and_forces_from_selection(
        params, pos2, box, cl, sel2)
    np.testing.assert_allclose(e_frozen, e_fresh, rtol=1e-5)
    scale = np.abs(np.asarray(f_fresh)).max()
    np.testing.assert_allclose(f_frozen, f_fresh, rtol=2e-4,
                               atol=2e-5 * scale)


def test_cluster_force_consistency_fd(setup):
    """Central finite differences along a random direction validate the
    custom-VJP chain (gather mirror + kernel backward)."""
    water, _, cluster, params, cl = setup
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    e0, f = cluster.energy_and_forces_fused(params, pos, box, cl)
    # Project along the force direction: the directional derivative is
    # -|f| (a large signal), so f32 energy cancellation noise stays small
    # relative to it (a random direction projects to ~1e-3, same order as
    # the f32 noise floor).
    v = np.asarray(f, np.float64)
    v /= np.linalg.norm(v)
    v = jnp.asarray(v, pos.dtype)
    h = 1e-3
    sel = cluster.select(pos, box, cl)
    ep = cluster.energy_from_selection(params, pos + h * v, box, cl, sel)
    em = cluster.energy_from_selection(params, pos - h * v, box, cl, sel)
    fd = (ep - em) / (2 * h)
    an = -jnp.vdot(f, v)
    np.testing.assert_allclose(np.asarray(an), np.asarray(fd), rtol=1e-2)


def test_cluster_overflow_contract(setup):
    """Compressing the system past the planned capacities must be reported
    via did_overflow (the number_found_pairs contract,
    getNeighborPairs.py:77-83)."""
    water, _, cluster, params, cl = setup
    plan = cluster.blocked_layout.cluster_plan
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    sel = select_clusters(pos, box, cluster.species_array, plan,
                          cluster.basis.radial_cutoff)
    assert not bool(sel.did_overflow(plan))
    # Compress into a half-size box: every capacity class blows.
    sel2 = select_clusters(pos * 0.5, box, cluster.species_array, plan,
                           cluster.basis.radial_cutoff)
    assert bool(sel2.did_overflow(plan))


def test_cluster_plan_rejects_small_box():
    """Boxes where a cluster pair could wrap twice must be refused (the
    window path remains the fallback there)."""
    water = make_water_box(150, seed=0)       # ~17 A: too small
    plan = plan_clusters(water.positions, water.box,
                         [0 if z == 8 else 1 for z in water.atomic_numbers],
                         5.1)
    assert plan is None


def test_cluster_plan_rejects_triclinic():
    water = make_water_box(1300, seed=0)
    box = np.asarray(water.box, np.float64)
    box[1, 0] = 0.4 * box[0, 0]               # strongly triclinic
    plan = plan_clusters(water.positions, box,
                         [0 if z == 8 else 1 for z in water.atomic_numbers],
                         5.1)
    assert plan is None
