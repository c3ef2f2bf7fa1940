"""Fused ensemble-NN kernel vs the XLA path (interpret mode on CPU).

The fused kernel's scope is the reference BatchedNN's (inference + input
gradients, BatchedNN.cpp:36-41); parity gates follow the bf16 compute
contract of batched_nn._dot_bf16 (~1e-3 relative).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import ANI2X_LAYER_DIMS
from nnpops_tpu.ops.batched_nn import (apply_species_net, build_grouping,
                                       ensemble_energy, init_ensemble)
from nnpops_tpu.ops.pallas_nn import (ensemble_energy_grouped_rows_fused,
                                      species_energies_fused)


@pytest.fixture(scope='module')
def ens():
    return init_ensemble(jax.random.PRNGKey(3), 1008,
                         ANI2X_LAYER_DIMS[:2], num_models=8)


def test_fused_matches_xla_energies(ens):
    n = 137            # deliberately not a block multiple
    x = jax.random.normal(jax.random.PRNGKey(0), (n, 1008)) * 0.3
    ref = jnp.mean(apply_species_net(ens.networks[0], x,
                                     jnp.bfloat16), axis=1)
    got = species_energies_fused(ens.networks[0], x, interpret=True)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-3)
    # And against the f32 oracle within the bf16 contract.
    ref32 = jnp.mean(apply_species_net(ens.networks[0], x), axis=1)
    err = np.abs(np.asarray(got) - np.asarray(ref32))
    assert err.max() < 5e-2 * max(1.0, np.abs(np.asarray(ref32)).max())


def test_fused_input_gradients(ens):
    n = 64
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 1008)) * 0.3

    def e_fused(x):
        return jnp.sum(species_energies_fused(ens.networks[1], x,
                                              interpret=True))

    def e_ref(x):
        return jnp.sum(jnp.mean(apply_species_net(ens.networks[1], x,
                                                  jnp.bfloat16), axis=1))

    g_fused = jax.grad(e_fused)(x)
    g_ref = jax.grad(e_ref)(x)
    num = np.abs(np.asarray(g_fused) - np.asarray(g_ref)).max()
    den = max(1e-6, float(jnp.abs(g_ref).max()))
    assert num / den < 3e-2


def test_fused_weight_gradients_are_zero_by_contract(ens):
    """Inference scope: weight cotangents are exactly zero (the training
    path is the XLA ensemble, which the reference lacks entirely)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 1008))

    def e(w0):
        net = ens.networks[0]._replace(weights=(w0,) + net_rest)
        return jnp.sum(species_energies_fused(net, x, interpret=True))

    net_rest = ens.networks[0].weights[1:]
    g = jax.grad(e)(ens.networks[0].weights[0])
    assert float(jnp.abs(g).max()) == 0.0


def test_grouped_rows_fused_total(ens):
    species = np.array([0] * 30 + [1] * 25, np.int32)
    g = build_grouping(species, 2)
    x = jax.random.normal(jax.random.PRNGKey(4), (55, 1008)) * 0.2
    tot = ensemble_energy_grouped_rows_fused(ens, x, g.counts,
                                             interpret=True)
    ref = ensemble_energy(ens, x[jnp.asarray(g.inverse)], g, jnp.bfloat16)
    np.testing.assert_allclose(float(tot), float(ref), rtol=2e-2, atol=5e-3)
