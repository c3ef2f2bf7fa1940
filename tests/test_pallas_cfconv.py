"""Parity tests for the fused CFConv backward kernel (ops/pallas_cfconv),
run in Pallas interpret mode on CPU against the XLA chunk-backward oracle
(ops/cfconv._make_payload_conv's _bwd_rows algebra via jax.grad chains)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import CFConvConfig
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.cfconv import CFConvParams, cfconv_masked, init_cfconv
from nnpops_tpu.utils.water import make_water_box


@pytest.mark.parametrize('activation', ['ssp', 'tanh'])
def test_bwd_kernel_matches_xla_chunk(activation):
    cfg = CFConvConfig(width=128, num_gaussians=50, cutoff=4.0,
                       gaussian_width=4.0 / 49, activation=activation)
    params = init_cfconv(jax.random.PRNGKey(0), cfg)
    water = make_water_box(160, seed=4)   # 480 atoms (16-multiple:
    # the unchunked pallas path needs 16-multiple rows, else it silently
    # falls back to XLA and the test would not exercise the kernel)
    n = len(water.positions)
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(n, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(n, 128).astype(np.float32))
    cl = CellList.create(water.box, cfg.cutoff, capacity=128)
    sel = cl.select(pos, box, build_mirror=True)
    d, idx, m = cl.payload_distances_from_selection(pos, box, sel)

    def loss(prm, dd, inp, impl, chunk):
        out = cfconv_masked(prm, dd, m, idx, inp, cfg, chunk_size=chunk,
                            bwd_impl=impl)
        return jnp.sum(out * w)

    for chunk in (None, 160):
        got = jax.grad(loss, argnums=(0, 1, 2))(params, d, x, 'pallas',
                                                chunk)
        ref = jax.grad(loss, argnums=(0, 1, 2))(params, d, x, 'xla', chunk)
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
