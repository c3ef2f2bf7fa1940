"""Cell-list correctness: must reproduce the brute-force neighbor sets and
produce identical AEVs to the dense path on a periodic water box."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.neighbors.cell_list import CellList, neighbor_list_to_pairs
from nnpops_tpu.ops.aev import compute_aev
from nnpops_tpu.models.ani import species_from_atomic_numbers
from nnpops_tpu.utils.water import make_water_box


@pytest.fixture(scope='module')
def water():
    return make_water_box(300, seed=2)   # 900 atoms, ~20.8 A box (4 cells/axis)


def brute_force_sets(positions, box, cutoff):
    n = len(positions)
    out = [set() for _ in range(n)]
    delta = positions[None] - positions[:, None]
    delta -= np.round(delta[..., 2:3] / box[2, 2]) * box[2]
    delta -= np.round(delta[..., 1:2] / box[1, 1]) * box[1]
    delta -= np.round(delta[..., 0:1] / box[0, 0]) * box[0]
    d2 = (delta ** 2).sum(-1)
    for i in range(n):
        for j in range(n):
            if i != j and d2[i, j] < cutoff * cutoff:
                out[i].add(j)
    return out


def test_matches_brute_force(water):
    cutoff = 5.1
    cl = CellList.create(water.box, cutoff, capacity=96)
    assert cl.use_cells  # the box is wide enough for real cells
    nlist = jax.jit(cl.build)(jnp.asarray(water.positions), jnp.asarray(water.box))
    expected = brute_force_sets(water.positions.astype(np.float64), water.box, cutoff)
    got = np.asarray(nlist.indices)
    n = len(water.positions)
    for i in range(n):
        mine = set(int(j) for j in got[i] if j < n)
        assert mine == expected[i], f'atom {i}: {mine ^ expected[i]}'
    assert int(nlist.max_neighbors) == max(len(s) for s in expected)
    assert not bool(nlist.did_overflow(cl.capacity, cl.cell_capacity))


def test_overflow_reported(water):
    cl = CellList.create(water.box, 5.1, capacity=4)
    nlist = cl.build(jnp.asarray(water.positions), jnp.asarray(water.box))
    assert int(nlist.max_neighbors) > 4
    assert bool(nlist.did_overflow(4, cl.cell_capacity))


def test_aev_cell_list_matches_dense(water):
    """ANI AEV via the cell list == AEV via the dense all-atoms list."""
    basis = ANIBasis.ani2x()
    species = jnp.asarray(species_from_atomic_numbers(water.atomic_numbers))
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    dense = compute_aev(pos, species, basis, box=box, angular_capacity=32)
    cl = CellList.create(water.box, basis.radial_cutoff, capacity=96)
    nlist = cl.build(pos, box)
    sparse = compute_aev(pos, species, basis, box=box, neighbors=nlist.indices,
                         angular_capacity=32)
    np.testing.assert_allclose(np.asarray(dense.radial), np.asarray(sparse.radial),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dense.angular), np.asarray(sparse.angular),
                               rtol=1e-4, atol=1e-5)


def test_pairs_from_neighbor_list(water):
    """The derived half pair list covers each close pair exactly once."""
    cutoff = 4.0
    cl = CellList.create(water.box, cutoff, capacity=64)
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    nlist = cl.build(pos, box)
    pairs = neighbor_list_to_pairs(nlist, pos, box)
    expected = brute_force_sets(water.positions.astype(np.float64), water.box, cutoff)
    num_expected = sum(len(s) for s in expected) // 2
    assert int(pairs.num_pairs) == num_expected
    a1 = np.asarray(pairs.atom1)[np.asarray(pairs.mask)]
    a2 = np.asarray(pairs.atom2)[np.asarray(pairs.mask)]
    seen = set(zip(a1.tolist(), a2.tolist()))
    assert len(seen) == num_expected
    for i, j in seen:
        assert j in expected[i]


def test_small_box_falls_back_to_dense():
    box = np.eye(3, dtype=np.float32) * 9.0
    cl = CellList.create(box, 4.5, capacity=32)
    assert not cl.use_cells
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(20, 3).astype(np.float32) * 9)
    nlist = cl.build(pos, jnp.asarray(box))
    expected = brute_force_sets(np.asarray(pos, np.float64), box, 4.5)
    got = np.asarray(nlist.indices)
    for i in range(20):
        assert set(int(j) for j in got[i] if j < 20) == expected[i]


def test_triclinic_tilted_box_no_missed_neighbors():
    """Regression: perpendicular widths must come from COLUMN norms of the
    inverse box — row norms overestimate the x-width of tilted boxes, making
    cells too narrow for the 27-stencil and silently dropping neighbors."""
    rng = np.random.RandomState(11)
    box = np.array([[16.0, 0, 0], [8.0, 16.0, 0], [0.0, 0, 16.0]],
                   dtype=np.float32)   # strongly tilted b: x-width is 14.3
    # Random atoms in the box (fractional -> cartesian).
    frac = rng.rand(400, 3)
    positions = (frac @ box).astype(np.float32)
    cutoff = 4.4
    cl = CellList.create(box, cutoff, capacity=128)
    if not cl.use_cells:
        import pytest
        pytest.skip('box too small for cells')
    nlist = cl.build(jnp.asarray(positions), jnp.asarray(box))
    expected = brute_force_sets(positions.astype(np.float64), box, cutoff)
    got = np.asarray(nlist.indices)
    for i in range(len(positions)):
        mine = set(int(j) for j in got[i] if j < len(positions))
        assert mine == expected[i], f'atom {i}: diff {mine ^ expected[i]}'
