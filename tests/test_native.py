"""Native host-runtime tests: parser parity with the Python loaders and
capacity-planner correctness against brute force."""
import numpy as np
import pytest

from nnpops_tpu.native import get_lib, load_molecule, plan_capacities
from nnpops_tpu.utils.io import load_mol2, load_pdb
from nnpops_tpu.utils.water import make_water_box


def test_native_builds():
    assert get_lib() is not None, 'native library failed to build'


@pytest.mark.parametrize('name', ['2iuz_ligand.mol2', '3o99_ligand.mol2'])
def test_mol2_parity(name):
    path = f'/root/reference/src/pytorch/molecules/{name}'
    import os
    if not os.path.exists(path):
        pytest.skip('reference fixtures not mounted')
    py = load_mol2(path)
    nat = load_molecule(path)
    np.testing.assert_array_equal(py.atomic_numbers, nat.atomic_numbers)
    np.testing.assert_allclose(py.positions, nat.positions, atol=1e-5)


def test_pdb_parity():
    path = '/root/reference/src/pytorch/molecules/water.pdb'
    import os
    if not os.path.exists(path):
        pytest.skip('reference fixtures not mounted')
    py = load_pdb(path)
    nat = load_molecule(path)
    np.testing.assert_array_equal(py.atomic_numbers, nat.atomic_numbers)
    np.testing.assert_allclose(py.positions, nat.positions, atol=1e-5)
    np.testing.assert_allclose(py.box, nat.box, atol=1e-4)


def test_plan_capacities_bounds_brute_force():
    water = make_water_box(200, seed=3)
    cutoff, ang = 5.1, 3.5
    k1, k2, occ = plan_capacities(water.positions, water.box, cutoff, ang,
                                  margin=1.0)
    # Brute-force the true maxima.
    pos = water.positions.astype(np.float64)
    delta = pos[None] - pos[:, None]
    for ax in (2, 1, 0):
        delta -= np.round(delta[..., ax:ax + 1] / water.box[ax, ax]) * water.box[ax]
    d2 = (delta ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    true_k1 = int((d2 < cutoff ** 2).sum(1).max())
    true_k2 = int((d2 < ang ** 2).sum(1).max())
    # margin=1.0 adds +1; planner must bound the truth (float edge effects
    # may add a count or two near the cutoff shell).
    assert true_k1 <= k1 <= true_k1 + 3
    assert true_k2 <= k2 <= true_k2 + 3


def test_plan_capacities_nonperiodic():
    rng = np.random.RandomState(0)
    pos = rng.rand(100, 3).astype(np.float32) * 10
    k1, k2, occ = plan_capacities(pos, None, 3.0, 1.5, margin=1.0)
    d2 = ((pos[None] - pos[:, None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    assert k1 >= int((d2 < 9.0).sum(1).max())
    assert k2 >= int((d2 < 2.25).sum(1).max())
