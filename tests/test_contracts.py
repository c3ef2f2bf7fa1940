"""Production-contract tests added in round 2:

* ``validate_box`` enforced at API boundaries (reference precondition,
  getNeighborPairsCPU.cpp:40-48);
* the overflow contract consumed by production paths — a capacity overflow
  mid-trajectory must be DETECTED between scan segments, not silently corrupt
  forces (getNeighborPairs.py:77-83, SURVEY §7.3);
* angular-capacity truncation is observable (``max_angular_neighbors``);
* standalone ``PME.compute_direct`` with a cell list matches the O(N^2)
  triangular path (pme.py:131-165 scalability fix).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.geometry import validate_box
from nnpops_tpu.md.integrators import initialize, langevin_baoab, run_md_sticky
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors.cell_list import CellList, payload_to_half_pairs
from nnpops_tpu.neighbors.pairs import get_neighbor_pairs
from nnpops_tpu.ops.aev import max_angular_neighbors
from nnpops_tpu.ops.pme import PME
from nnpops_tpu.utils.water import make_water_box


# ---------------------------------------------------------------------------
# validate_box at API boundaries.

BAD_BOXES = [
    # not reduced: a has nonzero y component
    np.array([[10.0, 1.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]], np.float32),
    # too small: width < 2 * cutoff
    np.array([[5.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]], np.float32),
    # not reduced: b[0] > a[0] / 2
    np.array([[10.0, 0.0, 0.0], [6.0, 10.0, 0.0], [0.0, 0.0, 10.0]], np.float32),
]


@pytest.mark.parametrize('bad_box', BAD_BOXES)
def test_validate_box_rejects(bad_box):
    with pytest.raises(ValueError):
        validate_box(bad_box, 3.0)


@pytest.mark.parametrize('bad_box', BAD_BOXES)
def test_get_neighbor_pairs_rejects_bad_box(bad_box):
    pos = jnp.asarray(np.random.RandomState(0).rand(8, 3), jnp.float32)
    with pytest.raises(ValueError):
        get_neighbor_pairs(pos, 3.0, box_vectors=jnp.asarray(bad_box))


@pytest.mark.parametrize('bad_box', BAD_BOXES)
def test_cell_list_create_rejects_bad_box(bad_box):
    with pytest.raises(ValueError):
        CellList.create(bad_box, 3.0, capacity=16)


def test_pme_compute_direct_rejects_bad_box():
    pme = PME(16, 16, 16, 4, 0.5, 138.935, np.zeros((8, 0), np.int32))
    pos = jnp.asarray(np.random.RandomState(0).rand(8, 3), jnp.float32)
    q = jnp.ones((8,), jnp.float32)
    with pytest.raises(ValueError):
        pme.compute_direct(pos, q, 3.0, jnp.asarray(BAD_BOXES[0]))


def test_validate_box_accepts_reduced_triclinic():
    box = np.array([[16.0, 0, 0], [8.0, 16.0, 0], [0.0, 0, 16.0]], np.float32)
    validate_box(box, 4.4)   # must not raise


# ---------------------------------------------------------------------------
# Overflow contract consumed in production paths.

def _tiny_system():
    water = make_water_box(40, seed=3)
    basis = ANIBasis.from_grids(2, 4.6, 3.1, EtaR=[16.0], ShfR=[1.0, 2.5, 4.0],
                                EtaA=[8.0], Zeta=[8.0], ShfA=[1.0, 2.0],
                                ShfZ=[0.5, 1.5])
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                         elements=(1, 8), angular_capacity=32)
    params = init_ani_params(jax.random.PRNGKey(0), basis,
                             layer_dims=((16, 8), (16, 8)), num_models=2)
    return water, basis, model, params


def test_check_overflow_passes_with_adequate_capacity():
    water, basis, model, params = _tiny_system()
    box = jnp.asarray(water.box)
    cl = CellList.create(water.box, basis.radial_cutoff, capacity=96)
    model.check_overflow(jnp.asarray(water.positions), box, cl)   # no raise


def test_check_overflow_detects_neighbor_overflow():
    water, basis, model, params = _tiny_system()
    box = jnp.asarray(water.box)
    cl = CellList.create(water.box, basis.radial_cutoff, capacity=4)
    with pytest.raises(RuntimeError, match='overflow'):
        model.check_overflow(jnp.asarray(water.positions), box, cl)


def test_check_overflow_detects_angular_overflow():
    water, basis, model, params = _tiny_system()
    import dataclasses
    model = dataclasses.replace(model, angular_capacity=2)
    box = jnp.asarray(water.box)
    cl = CellList.create(water.box, basis.radial_cutoff, capacity=64)
    with pytest.raises(RuntimeError, match='max_angular'):
        model.check_overflow(jnp.asarray(water.positions), box, cl)


def test_max_angular_neighbors_counts_truth():
    water, basis, model, params = _tiny_system()
    box = jnp.asarray(water.box)
    cl = CellList.create(water.box, basis.radial_cutoff, capacity=64)
    pos = jnp.asarray(water.positions)
    payload = cl.build_payload(pos, box)
    got = int(max_angular_neighbors(payload, basis.angular_cutoff))
    # Brute-force oracle.
    p = np.asarray(pos, np.float64)
    b = np.asarray(water.box, np.float64)
    best = 0
    for i in range(len(p)):
        d = p - p[i]
        for ax in (2, 1, 0):
            d -= np.round(d[:, ax:ax + 1] / b[ax, ax]) * b[ax]
        r = np.sqrt((d * d).sum(1))
        best = max(best, int(((r < basis.angular_cutoff) & (r > 0)).sum()))
    assert got == best


def test_sticky_md_overflow_detected_mid_trajectory():
    """A trajectory that overflows its neighbor capacity must be detected by
    the returned OverflowStats — the production consumer of the soft-failure
    contract."""
    water, basis, model, params = _tiny_system()
    box = jnp.asarray(water.box)
    # Deliberately undersized capacity: at liquid density each atom has far
    # more than 6 neighbors within the 5.1 A radial cutoff.
    cl = CellList.create(water.box, basis.radial_cutoff, capacity=6)
    onehot = jnp.asarray(model.species_onehot)

    def force_fn_of_sel(sel, pos):
        def energy(p):
            return model.energy_from_selection(params, p, box, cl, sel)
        e, g = jax.value_and_grad(energy)(pos)
        return e, -g

    masses = jnp.ones((model.num_atoms,), jnp.float32)
    state = initialize(lambda p: force_fn_of_sel(cl.select(p, box), p),
                       jnp.asarray(water.positions), masses, kT=0.596,
                       key=jax.random.PRNGKey(1))
    final, energies, stats = run_md_sticky(
        lambda p: cl.select(p, box), force_fn_of_sel,
        lambda ff: langevin_baoab(ff, masses, 1e-4, 1.0, 0.596),
        state, num_steps=4, refresh_every=2)
    assert int(stats.max_neighbors) > cl.capacity
    with pytest.raises(RuntimeError, match='overflow'):
        stats.check(cl.capacity, cl.cell_capacity)


# ---------------------------------------------------------------------------
# Standalone PME with a cell list.

def test_pme_direct_cell_list_matches_all_pairs():
    water = make_water_box(120, seed=5)
    n = len(water.positions)
    pme = PME(16, 16, 16, 4, 0.5, 138.935, np.zeros((n, 0), np.int32))
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    q = jnp.asarray(water.charges)
    cutoff = 5.0
    e_ref = float(pme.compute_direct(pos, q, cutoff, box))
    cl = CellList.create(water.box, cutoff, capacity=96)
    e_cl = float(jax.jit(
        lambda p: pme.compute_direct(p, q, cutoff, box, cell_list=cl))(pos))
    np.testing.assert_allclose(e_cl, e_ref, rtol=1e-5)
    # Forces agree too.
    g_ref = jax.grad(lambda p: pme.compute_direct(p, q, cutoff, box))(pos)
    g_cl = jax.grad(
        lambda p: pme.compute_direct(p, q, cutoff, box, cell_list=cl))(pos)
    np.testing.assert_allclose(np.asarray(g_cl), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_pme_direct_cell_list_with_exclusions():
    water = make_water_box(100, seed=7)
    n = len(water.positions)
    # TIP3P-style intramolecular exclusions: each O excludes its two H, etc.
    excl = np.full((n, 2), -1, np.int32)
    for m in range(n // 3):
        o, h1, h2 = 3 * m, 3 * m + 1, 3 * m + 2
        excl[o] = [h1, h2]
        excl[h1] = [o, h2]
        excl[h2] = [o, h1]
    pme = PME(16, 16, 16, 4, 0.5, 138.935, excl)
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    q = jnp.asarray(water.charges)
    cutoff = 5.0
    e_ref = float(pme.compute_direct(pos, q, cutoff, box))
    cl = CellList.create(water.box, cutoff, capacity=96)
    e_cl = float(pme.compute_direct(pos, q, cutoff, box, cell_list=cl))
    np.testing.assert_allclose(e_cl, e_ref, rtol=1e-5)


def test_payload_half_pairs_deltas_sign():
    """payload_to_half_pairs must follow the MaskedPairs convention
    (deltas = positions[atom1] - positions[atom2], minimum-imaged)."""
    water = make_water_box(30, seed=9)
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    cl = CellList.create(water.box, 4.0, capacity=48)
    pairs = payload_to_half_pairs(cl.build_payload(pos, box), 4.0)
    m = np.asarray(pairs.mask)
    a1 = np.asarray(pairs.atom1)[m]
    a2 = np.asarray(pairs.atom2)[m]
    d = np.asarray(pairs.deltas)[m]
    p = np.asarray(pos, np.float64)
    b = np.asarray(water.box, np.float64)
    expect = p[a1] - p[a2]
    for ax in (2, 1, 0):
        expect -= np.round(expect[:, ax:ax + 1] / b[ax, ax]) * b[ax]
    np.testing.assert_allclose(d, expect, rtol=1e-5, atol=1e-5)
