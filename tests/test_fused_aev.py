"""The gather-free payload pipeline must reproduce the index-based path
(which is itself golden-tested against TorchANI values)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params, species_from_atomic_numbers
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.aev import compute_aev, compute_aev_from_payload
from nnpops_tpu.utils.water import make_water_box


@pytest.fixture(scope='module', params=['cells', 'dense'])
def system(request):
    if request.param == 'cells':
        water = make_water_box(300, seed=2)      # 4 cells/axis
    else:
        water = make_water_box(60, seed=5)       # small box -> dense fallback
    basis = ANIBasis.ani2x()
    cl = CellList.create(water.box, basis.radial_cutoff, capacity=96)
    assert (cl.use_cells) == (request.param == 'cells')
    return water, basis, cl


def test_payload_matches_index_path(system):
    water, basis, cl = system
    species = jnp.asarray(species_from_atomic_numbers(water.atomic_numbers))
    onehot = jax.nn.one_hot(species, basis.num_species, dtype=jnp.float32)
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)

    payload = jax.jit(lambda p: cl.build_payload(p, box, onehot))(pos)
    assert not bool(payload.did_overflow(cl.capacity, cl.cell_capacity))
    fused = compute_aev_from_payload(payload, basis, angular_capacity=32)

    nlist = cl.build(pos, box)
    ref = compute_aev(pos, species, basis, box=box, neighbors=nlist.indices,
                      angular_capacity=32)
    np.testing.assert_allclose(np.asarray(ref.radial), np.asarray(fused.radial),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.angular), np.asarray(fused.angular),
                               rtol=1e-4, atol=1e-5)


def test_payload_neighbor_sets(system):
    """Payload indices must equal the index-based neighbor sets."""
    water, basis, cl = system
    species = jnp.asarray(species_from_atomic_numbers(water.atomic_numbers))
    onehot = jax.nn.one_hot(species, basis.num_species, dtype=jnp.float32)
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    payload = cl.build_payload(pos, box, onehot)
    nlist = cl.build(pos, box)
    n = len(water.positions)
    got = np.asarray(payload.indices)
    mask = np.asarray(payload.mask)
    ref = np.asarray(nlist.indices)
    for i in range(n):
        assert set(got[i][mask[i]].tolist()) == set(j for j in ref[i] if j < n)
    # Distances match positions recomputation.
    d = np.asarray(payload.distances)
    deltas = np.asarray(payload.deltas)
    np.testing.assert_allclose(np.linalg.norm(deltas[mask], axis=-1), d[mask],
                               rtol=1e-5, atol=1e-6)


def test_fused_model_energy_and_forces(system):
    """energy_fused == energy (index path) and forces agree."""
    water, basis, cl = system
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                         angular_capacity=32)
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)

    e_fused, f_fused = jax.jit(
        lambda pr, p: model.energy_and_forces_fused(pr, p, box, cl))(params, pos)
    nlist = cl.build(pos, box)
    e_ref, f_ref = model.energy_and_forces(params, pos, box=box,
                                           neighbors=nlist.indices)
    np.testing.assert_allclose(float(e_fused), float(e_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_fused), np.asarray(f_ref),
                               rtol=1e-3, atol=1e-4)


def test_payload_overflow_reported():
    water = make_water_box(300, seed=2)
    cl = CellList.create(water.box, 5.1, capacity=8)
    payload = cl.build_payload(jnp.asarray(water.positions),
                               jnp.asarray(water.box))
    assert bool(payload.did_overflow(8, cl.cell_capacity))
    assert int(payload.max_neighbors) > 8


def test_chunked_aev_matches_unchunked(system):
    """lax.map-chunked AEV must equal the one-shot evaluation."""
    water, basis, cl = system
    from nnpops_tpu.models.ani import species_from_atomic_numbers
    species = jnp.asarray(species_from_atomic_numbers(water.atomic_numbers))
    onehot = jax.nn.one_hot(species, basis.num_species, dtype=jnp.float32)
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    payload = cl.build_payload(pos, box, onehot)
    full = compute_aev_from_payload(payload, basis, 32)
    chunked = compute_aev_from_payload(payload, basis, 32, chunk_size=128)
    # Chunked contraction order differs -> fp reassociation at the 1e-6 level.
    np.testing.assert_allclose(np.asarray(full.radial), np.asarray(chunked.radial),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.angular), np.asarray(chunked.angular),
                               rtol=1e-4, atol=1e-6)


def test_determinism_bitwise(system):
    """Two evaluations give bitwise-identical forces — an upgrade over the
    reference's nondeterministic CUDA pair order + atomics (SURVEY §5
    'race detection': determinism by construction)."""
    water, basis, cl = system
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                         angular_capacity=32)
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    f = jax.jit(lambda pr, p: model.energy_and_forces_fused(pr, p, box, cl))
    e1, f1 = f(params, pos)
    e2, f2 = f(params, pos)
    assert float(e1) == float(e2)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
