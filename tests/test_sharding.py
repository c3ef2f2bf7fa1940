"""Multi-chip SPMD tests on the virtual 8-device CPU mesh.

Validates that the DP x EP training step and the atom-sharded (SP) inference
path compile with real shardings, execute, and agree with single-device
results.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.parallel.sharding import (atom_sharded_energy, init_train_state,
                                          jit_train_step, make_mesh,
                                          make_train_step, shard_batch,
                                          shard_params, TrainState)

BASIS = ANIBasis.from_grids(3, 4.6, 3.1, EtaR=[16.0], ShfR=[1.0, 2.0, 3.0],
                            EtaA=[8.0], Zeta=[8.0], ShfA=[1.0, 2.0],
                            ShfZ=[0.5, 1.5])
Z = [8, 1, 1, 8, 1, 1, 7, 1]   # 8 atoms -> divisible by mesh axes


@pytest.fixture(scope='module')
def setup():
    assert len(jax.devices()) == 8, 'tests need the virtual 8-device mesh'
    model = ANIModel.from_atomic_numbers(Z, BASIS, elements=(1, 8, 7))
    params = init_ani_params(jax.random.PRNGKey(0), BASIS,
                             layer_dims=((16, 8), (16, 8), (16, 8)),
                             num_models=4)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32) * 4)
    return model, params, batch


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {'dp': 4, 'mp': 2}
    mesh = make_mesh(8, model_parallel=4)
    assert mesh.shape == {'dp': 2, 'mp': 4}


def test_train_step_dp_ep(setup):
    """One training step over the (dp=4, mp=2) mesh: loss decreases and the
    result matches the unsharded step."""
    model, params, batch = setup
    mesh = make_mesh(8, model_parallel=2)
    opt = optax.sgd(1e-4)
    e_t = jnp.zeros((8,))
    f_t = jnp.zeros_like(batch)

    step = jit_train_step(model, opt, mesh)
    state = init_train_state(model, opt, params, mesh)
    batch_s, e_s, f_s = shard_batch(mesh, batch, e_t, f_t)
    new_state, loss = step(state, batch_s, e_s, f_s)
    _, loss2 = step(new_state, batch_s, e_s, f_s)
    assert np.isfinite(float(loss))
    assert float(loss2) < float(loss)   # SGD on a fixed batch reduces the loss

    # Parity with the plain single-device step.
    plain = make_train_step(model, opt)
    ps, pl = plain(TrainState(params, opt.init(params)), batch, e_t, f_t)
    np.testing.assert_allclose(float(loss), float(pl), rtol=1e-5)


def test_train_step_force_matching(setup):
    """Force matching = grad-of-grad through the sharded step."""
    model, params, batch = setup
    mesh = make_mesh(8, model_parallel=2)
    opt = optax.sgd(1e-5)
    step = jit_train_step(model, opt, mesh, force_weight=0.1)
    state = init_train_state(model, opt, params, mesh)
    batch_s, e_s, f_s = shard_batch(mesh, batch, jnp.zeros((8,)), jnp.zeros_like(batch))
    _, loss = step(state, batch_s, e_s, f_s)
    assert np.isfinite(float(loss))


def test_atom_sharded_energy_matches_dense(setup):
    """SP path: energy over an 8-way atom-sharded mesh == replicated energy,
    and forces through the psum match."""
    model, params, _ = setup
    mesh = make_mesh(8, model_parallel=1)   # dp axis = 8, used as the atom axis
    rng = np.random.RandomState(1)
    pos = jnp.asarray(rng.rand(8, 3).astype(np.float32) * 4)
    fn = atom_sharded_energy(model, mesh, axis='dp')
    with jax.sharding.set_mesh(mesh):
        e_sharded = float(jax.jit(fn)(params, pos))
        g_sharded = np.asarray(jax.jit(jax.grad(fn, argnums=1))(params, pos))
    e_ref = float(model.energy(params, pos))
    g_ref = np.asarray(jax.grad(model.energy, argnums=1)(params, pos))
    np.testing.assert_allclose(e_sharded, e_ref, rtol=1e-5)
    np.testing.assert_allclose(g_sharded, g_ref, rtol=1e-4, atol=1e-5)


def test_tensor_parallel_layer0():
    """TP: layer-0 contraction sharded over 'mp' must match the replicated
    grouped evaluation."""
    from nnpops_tpu.config import ANIBasis
    from nnpops_tpu.parallel.sharding import tp_ensemble_energy
    from nnpops_tpu.ops.batched_nn import ensemble_energy
    from nnpops_tpu.models.ani import ANIModel, init_ani_params
    # Basis with aev_length 32 (divisible by the 8-way TP axis).
    basis32 = ANIBasis.from_grids(2, 4.6, 3.1, EtaR=[16.0],
                                  ShfR=[1.0, 2.0, 3.0, 4.0], EtaA=[8.0],
                                  Zeta=[8.0], ShfA=[1.0, 2.0],
                                  ShfZ=[0.5, 1.0, 1.5, 2.0])
    model = ANIModel.from_atomic_numbers([8, 1, 1, 8, 1, 1, 8, 1],
                                         basis32, elements=(1, 8))
    params = init_ani_params(jax.random.PRNGKey(0), basis32,
                             layer_dims=((16, 8), (16, 8)), num_models=4)
    mesh = make_mesh(8, model_parallel=8)   # 8-way TP on the aev axis
    aev_len = model.basis.aev_length
    assert aev_len % 8 == 0, aev_len
    rng = np.random.RandomState(2)
    aev = jnp.asarray(rng.randn(8, aev_len).astype(np.float32))
    fn = tp_ensemble_energy(model, mesh, axis='mp')
    with jax.sharding.set_mesh(mesh):
        e_tp = float(jax.jit(fn)(params, aev))
    e_ref = float(ensemble_energy(params.ensemble, aev, model.grouping))
    np.testing.assert_allclose(e_tp, e_ref, rtol=1e-4)


def test_pipeline_parallel_mlp():
    """PP: a 4-stage microbatched pipeline must equal the sequential stack."""
    from nnpops_tpu.parallel.sharding import pipeline_ensemble_energy
    mesh = make_mesh(4, model_parallel=4)   # 4 pipeline stages on 'mp'
    rng = np.random.RandomState(3)
    width, n = 16, 32
    stage_w = jnp.asarray(rng.randn(4, width, width).astype(np.float32) * 0.3)
    stage_b = jnp.asarray(rng.randn(4, width).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(n, width).astype(np.float32))

    fn = pipeline_ensemble_energy((width,), mesh, axis='mp', num_microbatches=4)
    with jax.sharding.set_mesh(mesh):
        got = np.asarray(jax.jit(fn)(stage_w, stage_b, x))

    ref = np.asarray(x)
    for s in range(4):
        ref = np.maximum(ref @ np.asarray(stage_w[s]) + np.asarray(stage_b[s]), 0)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pipeline_ani_ensemble():
    """TRUE PP over the real ANI CELU ensemble: 3 layer-stages on 'mp',
    species-homogeneous microbatches; equals the replicated ensemble."""
    from nnpops_tpu.parallel.sharding import pipeline_ani_ensemble_energy
    from nnpops_tpu.ops.batched_nn import ensemble_energy
    model = ANIModel.from_atomic_numbers(Z, BASIS, elements=(1, 8, 7))
    params = init_ani_params(jax.random.PRNGKey(1), BASIS,
                             layer_dims=((16, 8), (12, 8), (16, 4)),
                             num_models=4)
    mesh = make_mesh(6, model_parallel=3)   # 3 pipeline stages == depth
    rng = np.random.RandomState(5)
    aev = jnp.asarray(rng.randn(len(Z), BASIS.aev_length).astype(np.float32))
    fn = pipeline_ani_ensemble_energy(model, mesh, axis='mp')
    with jax.sharding.set_mesh(mesh):
        e_pp = float(jax.jit(fn)(params, aev))
    e_ref = float(ensemble_energy(params.ensemble, aev, model.grouping))
    np.testing.assert_allclose(e_pp, e_ref, rtol=1e-5)


def test_tensor_parallel_model_sharded_tail():
    """TP with axis_size | num_models: every layer sharded (layer 0 over the
    AEV axis, layers 1+ over the model axis); equals the replicated path."""
    from nnpops_tpu.parallel.sharding import tp_ensemble_energy
    from nnpops_tpu.ops.batched_nn import ensemble_energy
    basis32 = ANIBasis.from_grids(2, 4.6, 3.1, EtaR=[16.0],
                                  ShfR=[1.0, 2.0, 3.0, 4.0], EtaA=[8.0],
                                  Zeta=[8.0], ShfA=[1.0, 2.0],
                                  ShfZ=[0.5, 1.0, 1.5, 2.0])
    model = ANIModel.from_atomic_numbers([8, 1, 1, 8, 1, 1, 8, 1],
                                         basis32, elements=(1, 8))
    params = init_ani_params(jax.random.PRNGKey(2), basis32,
                             layer_dims=((16, 8), (16, 8)), num_models=8)
    mesh = make_mesh(4, model_parallel=4)   # 4-way TP; 8 models % 4 == 0
    rng = np.random.RandomState(6)
    aev = jnp.asarray(rng.randn(8, model.basis.aev_length).astype(np.float32))
    fn = tp_ensemble_energy(model, mesh, axis='mp')
    with jax.sharding.set_mesh(mesh):
        e_tp = float(jax.jit(fn)(params, aev))
    e_ref = float(ensemble_energy(params.ensemble, aev, model.grouping))
    np.testing.assert_allclose(e_tp, e_ref, rtol=1e-4)


@pytest.mark.slow
def test_window_pipeline_sharded_matches_single_device():
    """The PRODUCTION window pipeline sharded over the 8-device mesh
    (radial kernel over cell blocks, angular+NN over tier-row blocks,
    psum energy) matches the single-device window path — energy AND
    forces — at 2.6k atoms (VERDICT r2 item 3)."""
    from nnpops_tpu.parallel.window_shard import window_sharded_energy
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(867, seed=0)            # 2601 atoms
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
    model = model.with_blocked_layout(water.positions, water.box,
                                      impl='window', skin=0.25)
    assert model.aev_impl == 'window'
    assert model.blocked_layout.ang_tier_rows is not None, (
        'test needs angular tiering to engage at this scale')
    params = init_ani_params(jax.random.PRNGKey(0), basis,
                             self_energies=np.linspace(-40, -1, 7))
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    cl = model.create_cell_list(water.box, skin=0.25)
    sel = model.select(pos, box, cl)

    e_ref, f_ref = jax.jit(
        lambda pr, p: model.energy_and_forces_from_selection(
            pr, p, box, cl, sel))(params, pos)

    mesh = make_mesh(8, model_parallel=1)
    fn = window_sharded_energy(model, mesh, axis='dp')
    e_sh = jax.jit(fn)(params, pos, box, sel)
    f_sh = -jax.jit(jax.grad(fn, argnums=1))(params, pos, box, sel)

    np.testing.assert_allclose(float(e_sh), float(e_ref), rtol=2e-6)
    scale = float(jnp.max(jnp.abs(f_ref)))
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref),
                               atol=2e-5 * scale)
