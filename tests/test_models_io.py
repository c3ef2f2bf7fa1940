"""Tests for file IO, the SchNet model family, and TorchANI npz round-trip."""
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import CFConvConfig
from nnpops_tpu.models.schnet import CFConvStack, SchNetModel
from nnpops_tpu.utils.io import load_mol2, load_pdb
from nnpops_tpu.utils.torchani_io import (load_ensemble_npz, save_ensemble_npz)


def test_load_mol2(tmp_path):
    content = textwrap.dedent('''\
        @<TRIPOS>MOLECULE
        test
         3 2 1
        SMALL
        @<TRIPOS>ATOM
          1 O1   0.000  0.100  0.200 O.3   1 RES  -0.8
          2 H1   0.957  0.000  0.000 H     1 RES   0.4
          3 CL1  2.000  1.000  0.000 Cl    1 RES   0.4
        @<TRIPOS>BOND
          1 1 2 1
        ''')
    p = tmp_path / 'mol.mol2'
    p.write_text(content)
    mol = load_mol2(str(p))
    np.testing.assert_array_equal(mol.atomic_numbers, [8, 1, 17])
    np.testing.assert_allclose(mol.positions[0], [0.0, 0.1, 0.2], atol=1e-6)
    assert mol.box is None


def test_load_pdb_with_box(tmp_path):
    content = (
        'CRYST1   15.000   15.000   15.000  90.00  90.00  90.00 P 1           1\n'
        'HETATM    1  O   HOH A   1       0.100   0.200   0.300  1.00  0.00           O\n'
        'HETATM    2  H1  HOH A   1       1.000   0.200   0.300  1.00  0.00           H\n'
        'END\n')
    p = tmp_path / 'water.pdb'
    p.write_text(content)
    mol = load_pdb(str(p))
    np.testing.assert_array_equal(mol.atomic_numbers, [8, 1])
    np.testing.assert_allclose(mol.box, np.eye(3) * 15.0, atol=1e-4)


def test_load_reference_fixtures_if_present():
    """When the reference tree is mounted, its ligand/box fixtures load."""
    import os
    mol2 = '/root/reference/src/pytorch/molecules/2iuz_ligand.mol2'
    pdb = '/root/reference/src/pytorch/molecules/water.pdb'
    if not os.path.exists(mol2):
        pytest.skip('reference fixtures not mounted')
    m = load_mol2(mol2)
    assert m.positions.shape[0] == 46      # the 46-atom 2iuz ligand
    w = load_pdb(pdb)
    assert w.positions.shape[0] == 306     # 102 waters
    assert w.box is not None and abs(w.box[0, 0] - 15.0) < 1e-3


def test_cfconv_stack_runs():
    cfg = CFConvConfig(width=16, num_gaussians=8, cutoff=3.0, gaussian_width=0.5)
    stack = CFConvStack(cfg, num_layers=6)
    params = stack.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(12, 3).astype(np.float32) * 5)
    from nnpops_tpu.ops.cfconv import build_cfconv_neighbors
    nb = build_cfconv_neighbors(pos, cfg.cutoff)
    x = jnp.asarray(rng.randn(12, 16).astype(np.float32))
    y = stack(params, nb, x)
    assert y.shape == (12, 16) and np.isfinite(np.asarray(y)).all()


def test_schnet_model_energy_forces():
    cfg = CFConvConfig(width=16, num_gaussians=8, cutoff=3.0, gaussian_width=0.5)
    model = SchNetModel(cfg, num_species=3, num_interactions=2)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    pos = jnp.asarray(rng.rand(10, 3).astype(np.float32) * 4)
    species = jnp.asarray(rng.randint(0, 3, 10), jnp.int32)
    e, f = jax.jit(model.energy_and_forces)(params, pos, species)
    assert np.isfinite(float(e)) and np.isfinite(np.asarray(f)).all()
    # Translation invariance (forces from relative geometry only).
    e2 = model.energy(params, pos + 3.0, species)
    np.testing.assert_allclose(float(e), float(e2), rtol=1e-5)
    # FD check of forces along the gradient direction.
    g = -np.asarray(f)
    norm = np.linalg.norm(g)
    d = 1e-3 / norm
    ep = float(model.energy(params, pos + d * g, species))
    em = float(model.energy(params, pos - d * g, species))
    np.testing.assert_allclose(norm, (ep - em) / (2e-3), rtol=5e-3, atol=1e-5)


def test_ensemble_npz_roundtrip(tmp_path):
    """save -> load reproduces an ensemble exactly and it evaluates."""
    rng = np.random.RandomState(0)
    dims = [(6, 4, 1), (6, 4, 1)]   # 2 species, in=6 -> 4 -> 1
    weights, biases = [], []
    for s in range(2):
        w_s, b_s = [], []
        for m in range(3):
            sizes = [(4, 6), (1, 4)]
            w_s.append([rng.randn(*sz).astype(np.float32) for sz in sizes])
            b_s.append([rng.randn(sz[0]).astype(np.float32) for sz in sizes])
        weights.append(w_s)
        biases.append(b_s)
    path = str(tmp_path / 'ens.npz')
    save_ensemble_npz(path, weights, biases, self_energies=[-1.0, -2.0])
    ens, sae = load_ensemble_npz(path)
    assert len(ens.networks) == 2 and ens.num_models == 3
    np.testing.assert_array_equal(np.asarray(sae), [-1.0, -2.0])
    np.testing.assert_allclose(np.asarray(ens.networks[1].weights[0][2]),
                               weights[1][2][0], rtol=0)
    # It must plug into the grouped evaluator.
    from nnpops_tpu.ops.batched_nn import build_grouping, ensemble_energy
    grouping = build_grouping(np.array([0, 1, 1]), 2)
    aev = jnp.asarray(rng.randn(3, 6).astype(np.float32))
    e = float(ensemble_energy(ens, aev, grouping))
    assert np.isfinite(e)
