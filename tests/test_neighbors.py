"""Tests for the getNeighborPairs-compatible op.

Re-expresses the reference's property tests (TestNeighbors.py:32-168) against
a NumPy oracle, including the doctest examples of getNeighborPairs.py:99-139.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.neighbors import get_neighbor_pairs, neighbor_pairs_masked


def numpy_oracle(positions, cutoff, box=None):
    """Brute-force half pair list (the oracle of TestNeighbors.py:44-60)."""
    n = len(positions)
    pairs = []
    for i in range(n):
        for j in range(i):
            d = positions[i] - positions[j]
            if box is not None:
                d = d - np.round(d[2] / box[2, 2]) * box[2]
                d = d - np.round(d[1] / box[1, 1]) * box[1]
                d = d - np.round(d[0] / box[0, 0]) * box[0]
            r = np.linalg.norm(d)
            if r <= cutoff:
                pairs.append((i, j, d, r))
    return pairs


def sort_found(neighbors, deltas, distances):
    neighbors = np.asarray(neighbors)
    mask = neighbors[0] >= 0
    order = np.lexsort((neighbors[1][mask], neighbors[0][mask]))
    return (neighbors[:, mask][:, order], np.asarray(deltas)[mask][order],
            np.asarray(distances)[mask][order])


def test_doctest_examples():
    """The four documented examples from getNeighborPairs.py:99-139."""
    positions = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])

    n, d, r, c = get_neighbor_pairs(positions, cutoff=3.0)
    np.testing.assert_array_equal(n, [[1, 2, 2], [0, 0, 1]])
    np.testing.assert_allclose(d, [[1, 0, 0], [2, 0, 0], [1, 0, 0]])
    np.testing.assert_allclose(r, [1, 2, 1])
    assert int(c[0]) == 3

    n, d, r, c = get_neighbor_pairs(positions, cutoff=1.5)
    np.testing.assert_array_equal(n, [[1, -1, 2], [0, -1, 1]])
    assert np.isnan(np.asarray(d)[1]).all() and np.isnan(np.asarray(r)[1])
    np.testing.assert_allclose(np.asarray(r)[[0, 2]], [1, 1])

    # num_pairs semantics note: the reference is self-inconsistent in capacity
    # mode (the CPU impl reports the padded size, getNeighborPairsCPU.cpp:97-98;
    # the CUDA impl and the docstring report the true found count,
    # getNeighborPairs.py:77-83). We follow the documented contract: the TRUE
    # number of pairs found.
    n, d, r, c = get_neighbor_pairs(positions, cutoff=3.0, max_num_pairs=6)
    np.testing.assert_array_equal(n, [[1, 2, 2, -1, -1, -1], [0, 0, 1, -1, -1, -1]])
    np.testing.assert_allclose(np.asarray(r)[:3], [1, 2, 1])
    assert np.isnan(np.asarray(r)[3:]).all()
    assert int(c[0]) == 3

    n, d, r, c = get_neighbor_pairs(positions, cutoff=1.5, max_num_pairs=6)
    np.testing.assert_array_equal(n, [[1, 2, -1, -1, -1, -1], [0, 1, -1, -1, -1, -1]])
    np.testing.assert_allclose(np.asarray(r)[:2], [1, 1])
    assert int(c[0]) == 2


@pytest.mark.parametrize('num_atoms', [1, 2, 3, 10, 100])
@pytest.mark.parametrize('cutoff', [0.1, 1.0, 10.0])
def test_against_oracle(num_atoms, cutoff):
    rng = np.random.RandomState(4321 + num_atoms)
    positions = (10 * rng.rand(num_atoms, 3) - 5).astype(np.float32)
    expected = numpy_oracle(positions, cutoff)
    n, d, r, c = get_neighbor_pairs(jnp.asarray(positions), cutoff)
    got_n, got_d, got_r = sort_found(n, d, r)
    assert got_n.shape[1] == len(expected)
    for col, (i, j, dv, rv) in zip(range(got_n.shape[1]), expected):
        assert (got_n[0, col], got_n[1, col]) == (i, j)
        np.testing.assert_allclose(got_d[col], dv, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got_r[col], rv, rtol=1e-5)


@pytest.mark.parametrize('triclinic', [False, True])
def test_periodic_oracle(triclinic):
    rng = np.random.RandomState(7)
    box = np.diag([10.0, 12.0, 14.0]).astype(np.float32)
    if triclinic:
        box[1, 0] = 3.0
        box[2, 0] = -2.0
        box[2, 1] = 4.0
    positions = (20 * rng.rand(50, 3) - 10).astype(np.float32)
    cutoff = 4.5
    expected = numpy_oracle(positions, cutoff, box)
    n, d, r, c = get_neighbor_pairs(jnp.asarray(positions), cutoff,
                                    box_vectors=jnp.asarray(box))
    got_n, got_d, got_r = sort_found(n, d, r)
    assert got_n.shape[1] == len(expected)
    for col, (i, j, dv, rv) in zip(range(got_n.shape[1]), expected):
        assert (got_n[0, col], got_n[1, col]) == (i, j)
        np.testing.assert_allclose(got_r[col], rv, rtol=1e-5)


def test_overflow_count_and_check_errors():
    """Capacity overflow reports the true count; check_errors raises
    (the contract of getNeighborPairs.py:51-57, :77-83)."""
    positions = jnp.zeros((5, 3))
    n, d, r, c = get_neighbor_pairs(positions, cutoff=1.0, max_num_pairs=3)
    assert int(c[0]) == 10  # all 5*4/2 pairs are within the cutoff
    assert n.shape == (2, 3)
    with pytest.raises(RuntimeError):
        get_neighbor_pairs(positions, cutoff=1.0, max_num_pairs=3, check_errors=True)


def test_capacity_equals_total():
    """max_num_pairs == number of pairs found works (TestNeighbors.py:158-168)."""
    positions = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
    n, d, r, c = get_neighbor_pairs(positions, cutoff=1.5, max_num_pairs=2)
    assert int(c[0]) == 2
    np.testing.assert_array_equal(n, [[1, 2], [0, 1]])


def test_masked_pairs_grad_is_nan_free():
    """The internal masked pair list must be differentiable without NaNs."""
    rng = np.random.RandomState(0)
    positions = jnp.asarray(rng.rand(20, 3).astype(np.float32) * 5)

    def energy(pos):
        p = neighbor_pairs_masked(pos, cutoff=2.0)
        return jnp.sum(jnp.where(p.mask, p.distances ** 2, 0.0))

    g = jax.grad(energy)(positions)
    assert np.isfinite(np.asarray(g)).all()
    # Gradient of sum r_ij^2 is 2 * sum_j (x_i - x_j) over pairs: check vs FD.
    eps = 1e-3
    e0 = energy(positions)
    direction = jnp.asarray(rng.rand(20, 3).astype(np.float32) - 0.5)
    fd = (energy(positions + eps * direction) - energy(positions - eps * direction)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, direction)), float(fd), rtol=2e-2)


def test_jit_static_shapes():
    """The op must compile once and be shape-stable across position updates
    (the CUDA-graph analog, SURVEY §4 implication (e))."""
    traces = []

    def fn(pos):
        traces.append(1)   # runs once per trace/compile, not per call
        return get_neighbor_pairs(pos, cutoff=2.0, max_num_pairs=16)

    f = jax.jit(fn)
    rng = np.random.RandomState(1)
    for _ in range(3):
        out = f(jnp.asarray(rng.rand(10, 3).astype(np.float32)))
    assert len(traces) == 1
