"""Tests for the species-grouped MLP ensemble vs the padded reference layout.

Differential testing in the spirit of TestBatchedNN.py:51-82: the
species-grouped MXU path must agree with the reference-layout padded
evaluation (which follows BatchedNN.py:90-111 exactly), and with a plain
NumPy oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.ops.batched_nn import (apply_padded_ensemble, build_grouping,
                                       celu, ensemble_energy, init_ensemble,
                                       pad_ensemble, atomic_energies_grouped)

AEV_LEN = 64
LAYER_DIMS = ((32, 24, 16), (28, 24, 16), (20, 16, 12))  # 3 species, ragged widths
NUM_MODELS = 4


@pytest.fixture(scope='module')
def setup():
    key = jax.random.PRNGKey(0)
    params = init_ensemble(key, AEV_LEN, LAYER_DIMS, NUM_MODELS)
    rng = np.random.RandomState(3)
    species = rng.randint(0, 3, size=17).astype(np.int32)
    aev = jnp.asarray(rng.randn(17, AEV_LEN).astype(np.float32))
    return params, species, aev


def numpy_oracle(params, species, aev):
    """Straightforward per-atom loop over the ensemble."""
    aev = np.asarray(aev)
    total = 0.0
    for i, s in enumerate(species):
        net = params.networks[int(s)]
        per_model = []
        for m in range(NUM_MODELS):
            h = aev[i]
            for l, (w, b) in enumerate(zip(net.weights, net.biases)):
                h = np.asarray(w)[m] @ h + np.asarray(b)[m]
                if l < len(net.weights) - 1:
                    h = np.asarray(celu(jnp.asarray(h)))
            per_model.append(h[0])
        total += np.mean(per_model)
    return total


def test_grouped_matches_oracle(setup):
    params, species, aev = setup
    grouping = build_grouping(species, 3)
    got = float(ensemble_energy(params, aev, grouping))
    expected = numpy_oracle(params, species, aev)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_grouped_matches_padded_reference_layout(setup):
    """The fast grouped path == the reference's padded per-atom layout
    (BatchedNN.py:66-111 semantics)."""
    params, species, aev = setup
    grouping = build_grouping(species, 3)
    grouped = float(ensemble_energy(params, aev, grouping))
    padded = pad_ensemble(params, species)
    ref = float(apply_padded_ensemble(padded, aev[None])[0])
    np.testing.assert_allclose(grouped, ref, rtol=1e-5)


def test_atom_order_restored(setup):
    """Per-atom energies come back in the original atom order."""
    params, species, aev = setup
    grouping = build_grouping(species, 3)
    per_atom = np.asarray(atomic_energies_grouped(params, aev, grouping))
    # Independently compute atom 5's energy by slicing it alone.
    single_species = np.array([species[5]], dtype=np.int32)
    g1 = build_grouping(single_species, 3)
    e5 = float(ensemble_energy(params, aev[5:6], g1))
    np.testing.assert_allclose(per_atom[5], e5, rtol=1e-5)


def test_weight_gradients_exist(setup):
    """Weight/bias grads flow (a deliberate superset of the reference, which
    returns empty weight grads — BatchedNN.cpp:36-41)."""
    params, species, aev = setup
    grouping = build_grouping(species, 3)
    g = jax.grad(lambda p: ensemble_energy(p, aev, grouping))(params)
    total = sum(float(jnp.abs(w).sum()) for net in g.networks for w in net.weights)
    assert total > 0


def test_jit_and_vmap_batching(setup):
    """Batched molecules via vmap (the [num_mols, ...] axis of BatchedNN.py:94)."""
    params, species, aev = setup
    grouping = build_grouping(species, 3)
    batch = jnp.stack([aev, 2 * aev, -aev])
    f = jax.jit(jax.vmap(lambda a: ensemble_energy(params, a, grouping)))
    out = np.asarray(f(batch))
    for i, a in enumerate([aev, 2 * aev, -aev]):
        np.testing.assert_allclose(out[i], float(ensemble_energy(params, a, grouping)),
                                   rtol=1e-5)
