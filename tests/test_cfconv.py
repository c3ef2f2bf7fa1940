"""Golden-value and gradient tests for CFConv.

Mirrors the reference tests (TestCFConv.h:81-248): SchNetPack-computed
expected outputs for nonperiodic / periodic / triclinic / tanh cases
(atol 1e-4, rtol 1e-3) plus FD-along-gradient validation of input and
position derivatives (TestCFConv.h:17-79).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import CFConvConfig
from nnpops_tpu.ops.cfconv import (CFConvParams, build_cfconv_neighbors, cfconv)

CONFIG = CFConvConfig(width=8, num_gaussians=5, cutoff=2.0, gaussian_width=0.5)


def setup_case(golden, case):
    params = CFConvParams.from_reference_layout(
        golden['w1'], golden['b1'], golden['w2'], golden['b2'])
    positions = jnp.asarray(golden['positions'])
    box = jnp.asarray(golden[f'{case}_box']) if case in ('periodic', 'triclinic') else None
    x = jnp.asarray(0.1 * np.arange(18 * 8, dtype=np.float32).reshape(18, 8))
    config = CONFIG if case != 'tanh' else CFConvConfig(
        width=8, num_gaussians=5, cutoff=2.0, gaussian_width=0.5, activation='tanh')
    return params, positions, box, x, config


def assert_golden(got, expected, atol=1e-4, rtol=1e-3):
    got = np.asarray(got).ravel()
    expected = np.asarray(expected).ravel()
    diff = np.abs(expected - got)
    bad = (diff > atol) & (diff / np.maximum(np.abs(expected), 1e-30) > rtol)
    assert not bad.any(), f'{bad.sum()} mismatches, max diff {diff.max()}'


@pytest.mark.parametrize('case', ['nonperiodic', 'periodic', 'triclinic', 'tanh'])
def test_golden_values(golden_cfconv, case):
    params, positions, box, x, config = setup_case(golden_cfconv, case)
    neighbors = build_cfconv_neighbors(positions, config.cutoff, box)
    y = cfconv(params, neighbors, x, config)
    assert_golden(y, golden_cfconv[f'{case}_output'])


@pytest.mark.parametrize('case', ['nonperiodic', 'periodic', 'tanh'])
def test_input_derivatives(golden_cfconv, case):
    """FD-along-gradient on the inputs (TestCFConv.h:33-53)."""
    params, positions, box, x, config = setup_case(golden_cfconv, case)
    neighbors = build_cfconv_neighbors(positions, config.cutoff, box)

    def output_elem(inp, i):
        return cfconv(params, neighbors, inp, config).ravel()[i]

    step = 1e-3
    rng = np.random.RandomState(0)
    for i in rng.choice(18 * 8, size=20, replace=False):
        g = np.asarray(jax.grad(output_elem)(x, int(i)))
        norm = np.linalg.norm(g)
        if norm < 1e-7:
            continue
        d = step / norm
        v1 = float(output_elem(x - d * g, int(i)))
        v2 = float(output_elem(x + d * g, int(i)))
        est = (v2 - v1) / (2 * step)
        assert abs(norm - est) <= 1e-5 + 5e-3 * abs(norm)


@pytest.mark.parametrize('case', ['nonperiodic', 'triclinic'])
def test_position_derivatives(golden_cfconv, case):
    """FD-along-gradient on positions, rebuilding the neighbor list at the
    displaced positions (TestCFConv.h:55-77)."""
    params, positions, box, x, config = setup_case(golden_cfconv, case)

    def output_elem(pos, i):
        nb = build_cfconv_neighbors(pos, config.cutoff, box)
        return cfconv(params, nb, x, config).ravel()[i]

    step = 1e-3
    rng = np.random.RandomState(1)
    for i in rng.choice(18 * 8, size=15, replace=False):
        g = np.asarray(jax.grad(output_elem)(positions, int(i)))
        assert np.isfinite(g).all()
        norm = np.linalg.norm(g)
        if norm < 1e-7:
            continue
        d = step / norm
        v1 = float(output_elem(positions - d * g, int(i)))
        v2 = float(output_elem(positions + d * g, int(i)))
        est = (v2 - v1) / (2 * step)
        assert abs(norm - est) <= 1e-5 + 5e-3 * abs(norm)


def test_shared_neighbor_list_across_layers(golden_cfconv):
    """One neighbor list serves multiple conv layers (CFConv.h:28-32)."""
    params, positions, box, x, config = setup_case(golden_cfconv, 'nonperiodic')
    neighbors = build_cfconv_neighbors(positions, config.cutoff, box)
    y = x
    for _ in range(3):
        y = cfconv(params, neighbors, y, config)
    assert np.isfinite(np.asarray(y)).all()


def test_capacity_mode_matches_all_pairs(golden_cfconv):
    params, positions, box, x, config = setup_case(golden_cfconv, 'nonperiodic')
    full = cfconv(params, build_cfconv_neighbors(positions, config.cutoff), x, config)
    capped = cfconv(params, build_cfconv_neighbors(positions, config.cutoff,
                                                   max_num_pairs=40), x, config)
    np.testing.assert_allclose(np.asarray(full), np.asarray(capped), rtol=1e-5, atol=1e-6)


def test_payload_path_matches_pairs(golden_cfconv):
    """cfconv_from_payload (O(N) cell-list path) == half-pair-list path."""
    from nnpops_tpu.neighbors.cell_list import CellList
    from nnpops_tpu.ops.cfconv import cfconv_from_payload
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(300, seed=4)
    cfg = CFConvConfig(width=8, num_gaussians=5, cutoff=4.0, gaussian_width=0.5)
    params = CFConvParams.from_reference_layout(
        golden_cfconv['w1'], golden_cfconv['b1'],
        golden_cfconv['w2'], golden_cfconv['b2'])
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(len(water.positions), 8).astype(np.float32))

    ref = cfconv(params, build_cfconv_neighbors(pos, cfg.cutoff, box), x, cfg)
    cl = CellList.create(water.box, cfg.cutoff, capacity=64)
    payload = cl.build_payload(pos, box)
    got = cfconv_from_payload(params, payload, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # And gradients flow to positions through the payload.
    g = jax.grad(lambda p: jnp.sum(
        cfconv_from_payload(params, cl.build_payload(p, box), x, cfg)))(pos)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_payload_stack_production_scale():
    """Production-scale story: a CFConv stack at 2601 atoms on a periodic
    box — chunked O(N) payload path == unchunked == O(N^2) half-pair path,
    with position gradients. (The reference has no periodic CFConv at all:
    CFConv.cpp:131 hardcodes periodic=false.)"""
    from nnpops_tpu.models.schnet import CFConvStack
    from nnpops_tpu.neighbors.cell_list import CellList
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(867, seed=5)            # 2601 atoms, ~29.7 A box
    cfg = CFConvConfig(width=32, num_gaussians=16, cutoff=6.0,
                       gaussian_width=6.0 / 15)
    stack = CFConvStack(cfg, num_layers=3)
    params = stack.init(jax.random.PRNGKey(2))
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2601, 32).astype(np.float32))

    ref = stack(params, build_cfconv_neighbors(pos, cfg.cutoff, box), x)
    cl = CellList.create(water.box, cfg.cutoff, capacity=128)
    payload = cl.build_payload(pos, box)
    got = stack.apply_payload(params, payload, x)
    got_chunked = stack.apply_payload(params, payload, x, chunk_size=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_chunked), np.asarray(got),
                               rtol=1e-6, atol=1e-6)
    g = jax.grad(lambda p: jnp.sum(stack.apply_payload(
        params, cl.build_payload(p, box), x, chunk_size=512)))(pos)
    assert np.isfinite(np.asarray(g)).all()


def test_payload_custom_adjoint_matches_ad(golden_cfconv):
    """The hand-written chunked VJP (self-adjoint input grad, fused
    weight/distance adjoints — the scatter-free production path) matches
    plain jax.grad through the rematerialized chunk body for EVERY
    cotangent: weights, inputs, and positions (through the payload)."""
    from nnpops_tpu.neighbors.cell_list import CellList
    from nnpops_tpu.ops.cfconv import cfconv_from_payload
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(300, seed=4)
    cfg = CFConvConfig(width=8, num_gaussians=5, cutoff=4.0,
                       gaussian_width=0.5)
    params = CFConvParams.from_reference_layout(
        golden_cfconv['w1'], golden_cfconv['b1'],
        golden_cfconv['w2'], golden_cfconv['b2'])
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    rng = np.random.RandomState(3)
    n = len(water.positions)
    x = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(n, 8).astype(np.float32))   # output cotangent
    cl = CellList.create(water.box, cfg.cutoff, capacity=64)

    def loss(p, prm, inp, custom, chunk):
        payload = cl.build_payload(p, box)
        out = cfconv_from_payload(prm, payload, inp, cfg, chunk_size=chunk,
                                  custom_adjoint=custom)
        return jnp.sum(out * w)

    for chunk in (None, 100):
        got = jax.grad(loss, argnums=(0, 1, 2))(pos, params, x, True, chunk)
        ref = jax.grad(loss, argnums=(0, 1, 2))(pos, params, x, False, chunk)
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
    # Tanh activation branch of the hand-written adjoint.
    cfg_t = CFConvConfig(width=8, num_gaussians=5, cutoff=4.0,
                         gaussian_width=0.5, activation='tanh')

    def loss_t(p, prm, inp, custom):
        payload = cl.build_payload(p, box)
        out = cfconv_from_payload(prm, payload, inp, cfg_t, chunk_size=100,
                                  custom_adjoint=custom)
        return jnp.sum(out * w)

    got = jax.grad(loss_t, argnums=(0, 1, 2))(pos, params, x, True)
    ref = jax.grad(loss_t, argnums=(0, 1, 2))(pos, params, x, False)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_payload_bf16_compute_dtype(golden_cfconv):
    """bf16 matmul/gather operands with f32 accumulation stay within ~1e-2
    relative of the f32 path (production option, mirrors nn_dtype)."""
    from nnpops_tpu.neighbors.cell_list import CellList
    from nnpops_tpu.ops.cfconv import cfconv_from_payload
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(300, seed=4)
    cfg = CFConvConfig(width=8, num_gaussians=5, cutoff=4.0,
                       gaussian_width=0.5)
    params = CFConvParams.from_reference_layout(
        golden_cfconv['w1'], golden_cfconv['b1'],
        golden_cfconv['w2'], golden_cfconv['b2'])
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(len(water.positions), 8).astype(np.float32))
    cl = CellList.create(water.box, cfg.cutoff, capacity=64)
    payload = cl.build_payload(pos, box)
    f32 = cfconv_from_payload(params, payload, x, cfg)
    bf16 = cfconv_from_payload(params, payload, x, cfg,
                               compute_dtype=jnp.bfloat16)
    scale = float(jnp.max(jnp.abs(f32)))
    err = float(jnp.max(jnp.abs(bf16 - f32))) / scale
    assert err < 1e-2, f'bf16 payload conv error {err}'


def test_distances_payload_mirror_adjoint(golden_cfconv):
    """select(build_mirror=True) + payload_distances_from_selection +
    cfconv_masked (the scatter-free 26k production chain) matches the
    generic payload path for values AND position/input/weight grads."""
    from nnpops_tpu.models.schnet import CFConvStack
    from nnpops_tpu.neighbors.cell_list import CellList
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(300, seed=4)
    cfg = CFConvConfig(width=8, num_gaussians=5, cutoff=4.0,
                       gaussian_width=0.5)
    stack = CFConvStack(cfg, num_layers=2)
    params = stack.init(jax.random.PRNGKey(7))
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    rng = np.random.RandomState(3)
    n = len(water.positions)
    x = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    cl = CellList.create(water.box, cfg.cutoff, capacity=64)

    def loss_new(p, prm, inp, chunk):
        sel = cl.select(p, box, build_mirror=True)
        d, idx, m = cl.payload_distances_from_selection(p, box, sel)
        return jnp.sum(stack.apply_distances(prm, d, idx, m, inp,
                                             chunk_size=chunk) * w)

    def loss_ref(p, prm, inp, chunk):
        payload = cl.build_payload(p, box)
        return jnp.sum(stack.apply_payload(prm, payload, inp,
                                           chunk_size=chunk,
                                           custom_adjoint=False) * w)

    for chunk in (None, 128):
        v_new, g_new = jax.value_and_grad(
            loss_new, argnums=(0, 1, 2))(pos, params, x, chunk)
        v_ref, g_ref = jax.value_and_grad(
            loss_ref, argnums=(0, 1, 2))(pos, params, x, chunk)
        np.testing.assert_allclose(float(v_new), float(v_ref),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_new),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=3e-4)
