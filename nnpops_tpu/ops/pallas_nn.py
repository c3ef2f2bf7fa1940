"""Fused Pallas TPU kernel for the atomic-network ensemble (inference+forces).

The ensemble evaluation is activation-traffic bound on TPU: the XLA path
(``batched_nn.apply_species_net``) streams the [N, aev] features through HBM
once per model per layer direction — measured 6.9 ms at 26k atoms vs a
~1.5 ms flop bound. This kernel keeps ALL ensemble weights resident in VMEM
(ANI-2x: ~5 MB bf16 for the largest species) and runs the whole
8-model x 4-layer MLP per atom block without materializing a single hidden
activation in HBM.

Scope matches the reference's BatchedNN exactly: **inference + input
gradients only** (BatchedNN.cpp:36-41 returns no weight gradients either).
The custom VJP returns zero cotangents for weights/biases — training uses
the XLA path (``ensemble_energy`` / ``apply_species_net``), which has full
weight gradients.

Math parity: four linear layers with CELU(alpha=0.1) between them and a
model-mean reduction (BatchedNN.py:90-111). Matmuls run at
``Precision.DEFAULT`` — one bf16 MXU pass with f32 accumulation — which is
the bf16 compute contract of ``batched_nn._dot_bf16`` without bf16 vector
types in the kernel (their dot_general lowering trips a Mosaic
``vector.broadcast`` verification bug on this backend). The out=1 last
layer is evaluated as an elementwise product accumulated across models
with ONE final lane reduction: Mosaic lowers a [B, d] x [1, d] dot as a
``vector.multi_reduction`` and rejects non-constant accumulators.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .batched_nn import CELU_ALPHA, EnsembleParams, SpeciesNet

Array = jnp.ndarray


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def make_fused_species_net(dims: Tuple[int, ...], num_models: int,
                           block_size: int = 256,
                           interpret: Optional[bool] = None):
    """Build the fused MLP for one species' layer dims.

    Returns ``fn(x [n, in0], weights, biases) -> [n, 1]`` per-atom
    model-MEAN energies, differentiable in ``x`` only (zero weight/bias
    cotangents — inference scope, see module docstring). ``weights[l]`` is
    [models, out_l, in_l], ``biases[l]`` [models, out_l] (SpeciesNet
    layout, used untransposed: dot_general picks the contraction side).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    dims = tuple(int(d) for d in dims)
    n_layers = len(dims) - 1
    m = int(num_models)
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    # VMEM-adaptive row blocks, separate for fwd and bwd (the bwd keeps the
    # dx accumulator and the saved pre-activations live — the ANI-2x H net
    # at 256 rows measured 17.6 MB vs the 16 MB scoped limit). Fixed cost:
    # resident bf16 weights + the largest per-model f32 upcast; row cost:
    # double-buffered x/dx blocks + activations, with 2x headroom for
    # Mosaic's transient stack.
    w_bytes = 2 * m * sum(dims[l] * dims[l + 1] for l in range(n_layers))
    fixed = w_bytes + 4 * max(dims[l] * dims[l + 1] for l in range(n_layers))
    max_h = max(dims[1:-1]) if n_layers > 1 else dims[-1]

    def pick_block(per_row: int) -> int:
        b = block_size
        while b > 32 and fixed + 2.0 * per_row * b > 14 * 2 ** 20:
            b //= 2
        return b

    fwd_block = pick_block(4 * (2 * dims[0] + 2 * max_h))
    bwd_block = min(pick_block(4 * (4 * dims[0] + 4 * max_h)), fwd_block)

    def matmul(h, w, side: str):
        # h [B, a] x w [out, in]: side 'fwd' contracts a=in -> [B, out];
        # side 'bwd' contracts a=out -> [B, in].
        dim = 1 if side == 'fwd' else 0
        return jax.lax.dot_general(
            h, w, (((1,), (dim,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=f32)

    def make_fwd_kernel(blk):
        def fwd_kernel(x_ref, *refs):
            w_refs = refs[:n_layers]
            b_refs = refs[n_layers:2 * n_layers]
            out_ref = refs[2 * n_layers]
            x = x_ref[...]                                  # [B, in0]
            acc = jnp.zeros((blk, dims[-2]), f32)
            bias_sum = jnp.zeros((blk, 1), f32)
            for mi in range(m):
                h = x
                for l in range(n_layers - 1):
                    z = (matmul(h, w_refs[l][mi].astype(f32), 'fwd')
                         + b_refs[l][mi])                   # [B, out_l] f32
                    h = jnp.where(z > 0, z,
                                  CELU_ALPHA * (jnp.exp(z / CELU_ALPHA)
                                                - 1.0))
                acc = acc + h * w_refs[n_layers - 1][mi].astype(f32)
                bias_sum = bias_sum + b_refs[n_layers - 1][mi]
            out_ref[...] = (jnp.sum(acc, axis=1, keepdims=True)
                            + bias_sum) * (1.0 / m)
        return fwd_kernel

    def make_bwd_kernel(blk):
        def bwd_kernel(x_ref, *refs):
            w_refs = refs[:n_layers]
            b_refs = refs[n_layers:2 * n_layers]
            g_ref = refs[2 * n_layers]
            dx_ref = refs[2 * n_layers + 1]
            x = x_ref[...]
            g = g_ref[...] * (1.0 / m)                      # [B, 1] f32
            dx = jnp.zeros((blk, dims[0]), f32)
            for mi in range(m):
                h = x
                zs = []
                for l in range(n_layers - 1):
                    z = (matmul(h, w_refs[l][mi].astype(f32), 'fwd')
                         + b_refs[l][mi])
                    zs.append(z)
                    h = jnp.where(z > 0, z,
                                  CELU_ALPHA * (jnp.exp(z / CELU_ALPHA)
                                                - 1.0))
                # Last layer (out=1): d_h3 = g * w4_row, no dot.
                d = g * w_refs[n_layers - 1][mi].astype(f32)  # [B, d3]
                for l in range(n_layers - 2, -1, -1):
                    z = zs[l]
                    d = d * jnp.where(z > 0, 1.0,
                                      jnp.exp(z / CELU_ALPHA))
                    d = matmul(d, w_refs[l][mi].astype(f32), 'bwd')
                dx = dx + d
            dx_ref[...] = dx
        return bwd_kernel

    def row_spec(blk, w):
        return pl.BlockSpec((blk, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def wb_specs(weights, biases):
        return ([const_spec(w.shape) for w in weights]
                + [const_spec(bb.shape) for bb in biases])

    def run_fwd(x, weights, biases):
        n = x.shape[0]
        blk = fwd_block
        return pl.pallas_call(
            make_fwd_kernel(blk), grid=(n // blk,),
            in_specs=[row_spec(blk, dims[0])] + wb_specs(weights, biases),
            out_specs=row_spec(blk, 1),
            out_shape=jax.ShapeDtypeStruct((n, 1), f32),
            interpret=interpret,
        )(x, *weights, *biases)

    def run_bwd(x, weights, biases, g):
        n = x.shape[0]
        blk = bwd_block
        return pl.pallas_call(
            make_bwd_kernel(blk), grid=(n // blk,),
            in_specs=([row_spec(blk, dims[0])] + wb_specs(weights, biases)
                      + [row_spec(blk, 1)]),
            out_specs=row_spec(blk, dims[0]),
            out_shape=jax.ShapeDtypeStruct((n, dims[0]), f32),
            interpret=interpret,
        )(x, *weights, *biases, g)

    @jax.custom_vjp
    def fused(x, weights, biases):
        return run_fwd(x, weights, biases)

    def _fwd(x, weights, biases):
        return run_fwd(x, weights, biases), (x, weights, biases)

    def _bwd(res, g):
        x, weights, biases = res
        dx = run_bwd(x, weights, biases, g.astype(f32))
        return (dx.astype(x.dtype),
                tuple(jnp.zeros_like(w) for w in weights),
                tuple(jnp.zeros_like(bb) for bb in biases))

    fused.defvjp(_fwd, _bwd)

    def apply(x, weights, biases):
        n = x.shape[0]
        n_pad = max(_round_up(n, fwd_block), fwd_block)
        if n_pad != n:
            x = jnp.concatenate(
                [x, jnp.zeros((n_pad - n, x.shape[1]), x.dtype)], axis=0)
        # Weights ride VMEM-resident in bf16 (the in-kernel per-model slice
        # upcasts to f32; DEFAULT matmul precision is one bf16 MXU pass
        # regardless, so nothing is lost). [m, out] biases -> [m, 1, out]
        # so the in-kernel [mi] index yields a broadcastable [1, out] tile.
        weights16 = tuple(w.astype(bf16) for w in weights)
        biases3 = tuple(bb.astype(f32).reshape(m, 1, -1) for bb in biases)
        e = fused(x, weights16, biases3)
        return jax.lax.slice_in_dim(e, 0, n, axis=0)

    return apply


@functools.lru_cache(maxsize=64)
def _cached_net(dims: Tuple[int, ...], num_models: int, block_size: int,
                interpret: Optional[bool]):
    return make_fused_species_net(dims, num_models, block_size, interpret)


def species_energies_fused(net: SpeciesNet, x: Array,
                           interpret: Optional[bool] = None) -> Array:
    """[n, aev] -> [n, 1] per-atom model-mean energies for one species
    (fused kernel; differentiable in x only)."""
    dims = (net.weights[0].shape[2],) + tuple(
        w.shape[1] for w in net.weights)
    fn = _cached_net(dims, net.weights[0].shape[0], 256, interpret)
    return fn(x, net.weights, net.biases)


def ensemble_energy_grouped_rows_fused(params: EnsembleParams, aev: Array,
                                       counts: Sequence[int],
                                       interpret: Optional[bool] = None,
                                       ) -> Array:
    """Drop-in for ``batched_nn.ensemble_energy_grouped_rows`` on the fused
    kernel (species-grouped rows; inference + input gradients only)."""
    total = jnp.zeros((), jnp.float32)
    start = 0
    for s, count in enumerate(counts):
        if count == 0:
            continue
        block = jax.lax.slice_in_dim(aev, start, start + count, axis=0)
        e = species_energies_fused(params.networks[s], block, interpret)
        total = total + jnp.sum(e)
        start += count
    return total
