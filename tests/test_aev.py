"""Golden-value and gradient tests for the ANI symmetry functions.

Mirrors the reference C++ test strategy (TestANISymmetryFunctions.h):
golden AEVs computed with TorchANI for nonperiodic / periodic / triclinic
boxes (atol 1e-4, rtol 1e-3), plus the finite-difference-along-gradient
derivative validator (step 1e-3, atol 1e-5, rtol 5e-3) for both torchani and
publication modes.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.ops.aev import compute_aev, aev_forward


def make_basis(golden, torchani=True):
    rp = golden['radial_params']      # (eta, rs)
    ap = golden['angular_params']     # (eta, rs, zeta, thetas)
    return ANIBasis(
        num_species=2, radial_cutoff=4.5, angular_cutoff=3.5,
        radial_eta=tuple(rp[:, 0].tolist()), radial_rs=tuple(rp[:, 1].tolist()),
        angular_eta=tuple(ap[:, 0].tolist()), angular_rs=tuple(ap[:, 1].tolist()),
        angular_zeta=tuple(ap[:, 2].tolist()), angular_thetas=tuple(ap[:, 3].tolist()),
        torchani=torchani)


def assert_golden(got, expected, atol=1e-4, rtol=1e-3):
    got = np.asarray(got).ravel()
    expected = np.asarray(expected).ravel()
    diff = np.abs(expected - got)
    bad = (diff > atol) & (diff / np.maximum(np.abs(expected), 1e-30) > rtol)
    assert not bad.any(), (
        f'{bad.sum()} mismatches; worst: expected '
        f'{expected[bad][np.argmax(diff[bad])]} got {got[bad][np.argmax(diff[bad])]}')


@pytest.mark.parametrize('case', ['nonperiodic', 'periodic', 'triclinic'])
def test_golden_values(golden_ani, case):
    basis = make_basis(golden_ani, torchani=True)
    positions = jnp.asarray(golden_ani['positions'])
    species = jnp.asarray(golden_ani['species'])
    box = jnp.asarray(golden_ani[f'{case}_box']) if case != 'nonperiodic' else None
    radial, angular = compute_aev(positions, species, basis, box=box)
    assert_golden(radial, golden_ani[f'{case}_radial'])
    assert_golden(angular, golden_ani[f'{case}_angular'])


@pytest.mark.parametrize('case', ['nonperiodic', 'periodic', 'triclinic'])
@pytest.mark.parametrize('torchani', [True, False])
def test_derivatives(golden_ani, case, torchani):
    """FD-along-gradient validation for every output element
    (TestANISymmetryFunctions.h:14-58)."""
    basis = make_basis(golden_ani, torchani=torchani)
    positions = jnp.asarray(golden_ani['positions'])
    species = jnp.asarray(golden_ani['species'])
    box = jnp.asarray(golden_ani[f'{case}_box']) if case != 'nonperiodic' else None

    flat = jax.jit(lambda pos: aev_forward(pos, species, basis, box=box).ravel())
    values = np.asarray(flat(positions))
    jac_fn = jax.jit(jax.jacrev(lambda pos: aev_forward(pos, species, basis, box=box).ravel()))
    jac = np.asarray(jac_fn(positions))   # [outputs, N, 3]

    step = 1e-3
    rng = np.random.RandomState(0)
    # Validating all 288 outputs x FD is cheap; do every element like the reference.
    for i in range(values.shape[0]):
        grad = jac[i]
        norm = np.linalg.norm(grad)
        if norm < 1e-7:
            continue
        delta = step / norm
        v1 = np.asarray(flat(positions - delta * grad))[i]
        v2 = np.asarray(flat(positions + delta * grad))[i]
        estimate = (v2 - v1) / (2 * step)
        assert np.isfinite(estimate)
        assert abs(norm - estimate) <= 1e-5 + 5e-3 * abs(norm), (
            f'output {i}: grad norm {norm} vs FD {estimate}')


def test_angular_capacity_compaction(golden_ani):
    """Capping angular neighbors at the true max neighbor count must not
    change the result (compaction correctness)."""
    basis = make_basis(golden_ani)
    positions = jnp.asarray(golden_ani['positions'])
    species = jnp.asarray(golden_ani['species'])
    full = compute_aev(positions, species, basis)
    capped = compute_aev(positions, species, basis, angular_capacity=12)
    np.testing.assert_allclose(np.asarray(full.angular), np.asarray(capped.angular),
                               rtol=1e-6, atol=1e-7)


def test_publication_vs_torchani_mode(golden_ani):
    """The two modes must differ in the documented ways only: radial x4 and
    the 0.95-dot angle distortion (ANISymmetryFunctions.h:55-58)."""
    positions = jnp.asarray(golden_ani['positions'])
    species = jnp.asarray(golden_ani['species'])
    b_t = make_basis(golden_ani, torchani=True)
    b_p = make_basis(golden_ani, torchani=False)
    r_t, a_t = compute_aev(positions, species, b_t)
    r_p, a_p = compute_aev(positions, species, b_p)
    np.testing.assert_allclose(np.asarray(r_p), 4 * np.asarray(r_t), rtol=1e-5)
    # Angular values differ (0.95 angle factor) but stay in the same ballpark.
    assert not np.allclose(np.asarray(a_p), np.asarray(a_t), rtol=1e-3)
    assert np.max(np.abs(np.asarray(a_p) - np.asarray(a_t))) < 1.0


def test_jit_cache_stable(golden_ani):
    basis = make_basis(golden_ani)
    species = jnp.asarray(golden_ani['species'])
    f = jax.jit(lambda pos: aev_forward(pos, species, basis))
    rng = np.random.RandomState(0)
    base = golden_ani['positions']
    for _ in range(3):
        f(jnp.asarray(base + 0.01 * rng.rand(*base.shape).astype(np.float32)))
    assert f._cache_size() == 1
