"""Window-kernel PME direct space (ops.pallas_pme): parity against the
pair-list path, exclusions, gradients, and the occupancy contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.ops.pme import PME
from nnpops_tpu.utils.water import make_water_box

CUTOFF = 3.5


@pytest.fixture(scope='module')
def setup():
    water = make_water_box(50, seed=3)        # box ~11.4 A, 3 cells of 3.5
    n = len(water.positions)
    # Intramolecular exclusions: O-H1, O-H2, H1-H2 per water (atom order
    # O, H, H per molecule).
    excl = np.full((n, 2), -1, np.int32)
    for m in range(n // 3):
        o, h1, h2 = 3 * m, 3 * m + 1, 3 * m + 2
        excl[o] = [h1, h2]
        excl[h1] = [o, h2]
        excl[h2] = [o, h1]
    return water, excl


def _pair(pme, water, cutoff=CUTOFF):
    box = jnp.asarray(water.box)
    q = jnp.asarray(water.charges)

    def f(p):
        return pme.compute_direct(p, q, cutoff, box, max_num_pairs=-1)
    return f


def _window(pme, water, cutoff=CUTOFF):
    box = jnp.asarray(water.box)
    q = jnp.asarray(water.charges)
    plan = pme.plan_direct_window(water.box, cutoff, water.positions)
    assert plan[0] is not None

    def f(p):
        return pme.compute_direct_window(p, q, cutoff, box, plan)
    return f, plan


@pytest.mark.parametrize('use_excl', [False, True])
def test_window_direct_matches_pairs(setup, use_excl):
    water, excl = setup
    n = len(water.positions)
    exclusions = excl if use_excl else np.zeros((n, 0), np.int32)
    pme = PME(16, 16, 16, 5, 0.35, 138.935, exclusions)
    pos = jnp.asarray(water.positions)
    e1 = _pair(pme, water)(pos)
    f_win, _ = _window(pme, water)
    e2 = f_win(pos)
    np.testing.assert_allclose(e2, e1, rtol=2e-5)


def test_window_direct_gradients(setup):
    water, excl = setup
    pme = PME(16, 16, 16, 5, 0.35, 138.935, excl)
    pos = jnp.asarray(water.positions)
    q = jnp.asarray(water.charges)
    box = jnp.asarray(water.box)
    plan = pme.plan_direct_window(water.box, CUTOFF, water.positions)
    gp1, gq1 = jax.grad(
        lambda p, qq: pme.compute_direct(p, qq, CUTOFF, box, -1),
        argnums=(0, 1))(pos, q)
    gp2, gq2 = jax.grad(
        lambda p, qq: pme.compute_direct_window(p, qq, CUTOFF, box, plan),
        argnums=(0, 1))(pos, q)
    ps = np.abs(np.asarray(gp1)).max()
    np.testing.assert_allclose(gp2, gp1, rtol=1e-4, atol=1e-5 * ps)
    qs = np.abs(np.asarray(gq1)).max()
    np.testing.assert_allclose(gq2, gq1, rtol=1e-4, atol=1e-5 * qs)


def test_window_direct_wrapped_positions(setup):
    """Atoms outside the primary box wrap consistently (energy is
    translation invariant). A translation re-bins every atom, so the plan
    needs a margin that holds BOTH configurations — verified via the
    occupancy contract (a too-tight capacity is a reported soft failure,
    not silent: see test_window_occupancy_detects_overflow)."""
    water, excl = setup
    n = len(water.positions)
    pme = PME(16, 16, 16, 5, 0.35, 138.935, np.zeros((n, 0), np.int32))
    plan = pme.plan_direct_window(water.box, CUTOFF, water.positions,
                                  margin=2.0)
    box = jnp.asarray(water.box)
    q = jnp.asarray(water.charges)
    pos = jnp.asarray(water.positions)
    pos2 = pos - 0.4 * jnp.diag(box)[None, :]
    assert int(pme.direct_window_overflow(pos2, box, plan)) <= plan[1]
    e1 = pme.compute_direct_window(pos, q, CUTOFF, box, plan)
    e2 = pme.compute_direct_window(pos2, q, CUTOFF, box, plan)
    np.testing.assert_allclose(e2, e1, rtol=1e-5)


def test_window_occupancy_detects_overflow(setup):
    """When a configuration exceeds the planned cell capacity, the energy
    is silently wrong by design — and the occupancy count reports it
    (the number_found_pairs contract, getNeighborPairs.py:77-83)."""
    water, excl = setup
    n = len(water.positions)
    pme = PME(16, 16, 16, 5, 0.35, 138.935, np.zeros((n, 0), np.int32))
    plan = pme.plan_direct_window(water.box, CUTOFF, water.positions)
    box = jnp.asarray(water.box)
    pos2 = (jnp.asarray(water.positions)
            - 0.4 * jnp.diag(box)[None, :])     # re-bins into denser cells
    occ = int(pme.direct_window_overflow(pos2, box, plan))
    assert occ > plan[1]


def test_window_occupancy_contract(setup):
    water, excl = setup
    n = len(water.positions)
    pme = PME(16, 16, 16, 5, 0.35, 138.935, np.zeros((n, 0), np.int32))
    plan = pme.plan_direct_window(water.box, CUTOFF, water.positions)
    occ = pme.direct_window_overflow(jnp.asarray(water.positions),
                                     jnp.asarray(water.box), plan)
    assert int(occ) <= plan[1]          # the plan must actually hold
    assert int(occ) > 0


@pytest.mark.parametrize('use_excl', [False, True])
def test_window_bucketed_matches_unbucketed(setup, use_excl):
    """Cell-occupancy bucketing (big cells at full rows via the cell-id
    prefetch map, small cells packed to small_cap) reproduces the
    unbucketed window energy and position gradients exactly."""
    water, excl = setup
    n = len(water.positions)
    e = excl if use_excl else np.zeros((n, 0), np.int32)
    pme = PME(12, 12, 12, 4, 1.1, 138.935, e)
    box = jnp.asarray(water.box)
    q = jnp.asarray(water.charges)
    plan = pme.plan_direct_window(water.box, CUTOFF, water.positions)
    # Force a non-trivial split regardless of the sampled distribution.
    cap = plan[1]
    small = max(8, cap - 8)
    nbig = max(1, 27 // 2)
    bucket_plan = (plan[0], cap, small, nbig)
    pos = jnp.asarray(water.positions)

    def f_ref(p):
        return pme.compute_direct_window(p, q, CUTOFF, box, plan)

    def f_buck(p):
        return pme.compute_direct_window(p, q, CUTOFF, box, bucket_plan)

    e_ref, g_ref = jax.value_and_grad(f_ref)(pos)
    # Validity gate: only compare when the forced split actually holds.
    occ = pme.direct_window_overflow(pos, box, bucket_plan)
    if int(occ) > cap:
        pytest.skip('forced bucket split overflows for this sample')
    e_b, g_b = jax.value_and_grad(f_buck)(pos)
    np.testing.assert_allclose(float(e_b), float(e_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_window_bucketed_count_overflow_detected(setup):
    """More big cells than planned must trip the overflow channel."""
    water, _ = setup
    n = len(water.positions)
    pme = PME(12, 12, 12, 4, 1.1, 138.935, np.zeros((n, 0), np.int32))
    plan = pme.plan_direct_window(water.box, CUTOFF, water.positions)
    # small_cap 8 makes nearly every cell 'big'; num_big 1 under-plans.
    bucket_plan = (plan[0], plan[1], 8, 1)
    occ = pme.direct_window_overflow(jnp.asarray(water.positions),
                                     jnp.asarray(water.box), bucket_plan)
    assert int(occ) > plan[1]
