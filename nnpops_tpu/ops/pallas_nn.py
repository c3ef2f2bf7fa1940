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

The kernel is VPU-elementwise bound (CELU/bias/select chains — measured:
matmuls fully overlap, no-matmul == full kernel time), so under autodiff
the forward runs a FUSED energy+gradient kernel: the input gradient is
linear in the per-atom cotangent, so one pass emits ``(e, dx1 = dx|g=1)``
with the whole CELU chain (exp included) computed once and shared between
the activation and its derivative; the VJP is then a single ``g * dx1``
multiply. vs the recompute-style separate backward kernel this replaces:
grouped fwd+grad 4.7 -> 3.36 ms at 26k rows (probe_nn6).

Math parity: four linear layers with CELU(alpha=0.1) between them and a
model-mean reduction (BatchedNN.py:90-111). Matmuls run with true bf16
operands and f32 accumulation — the bf16 compute contract of
``batched_nn._dot_bf16``. The out=1 last layer is evaluated as an
elementwise product accumulated across models with ONE final lane
reduction: Mosaic lowers a [B, d] x [1, d] dot as a
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
        # side 'bwd' contracts a=out -> [B, in]. True bf16 operands with f32
        # accumulation (the bf16 compute contract); the MXU passes fully
        # overlap the VPU elementwise work, which is what bounds this kernel
        # (probe_nn5: no-matmul == full within noise at 17k rows).
        dim = 1 if side == 'fwd' else 0
        return jax.lax.dot_general(
            h.astype(bf16), w, (((1,), (dim,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=f32)

    def make_fwd_kernel(blk):
        def fwd_kernel(x_ref, *refs):
            w_refs = refs[:n_layers]
            b_refs = refs[n_layers:2 * n_layers]
            out_ref = refs[2 * n_layers]
            x16 = x_ref[...].astype(bf16)                   # [B, in0]
            acc = jnp.zeros((blk, dims[-2]), f32)
            bias_sum = jnp.zeros((blk, 1), f32)
            for mi in range(m):
                h = x16
                for l in range(n_layers - 1):
                    z = (matmul(h, w_refs[l][mi], 'fwd')
                         + b_refs[l][mi])                   # [B, out_l] f32
                    h = jnp.where(z > 0, z,
                                  CELU_ALPHA * (jnp.exp(z / CELU_ALPHA)
                                                - 1.0))
                acc = acc + h * w_refs[n_layers - 1][mi].astype(f32)
                bias_sum = bias_sum + b_refs[n_layers - 1][mi]
            out_ref[...] = (jnp.sum(acc, axis=1, keepdims=True)
                            + bias_sum) * (1.0 / m)
        return fwd_kernel

    def make_fwdgrad_kernel(blk):
        """Energy AND input gradient at unit cotangent in ONE pass.

        The input gradient is LINEAR in the per-atom output cotangent g
        (the chain is elementwise multiplies and matmuls), so the kernel
        emits dx1 = dx|g=1 and the VJP is just g * dx1 — and every CELU
        exp is computed ONCE and shared between the activation and its
        derivative (the separate recompute-bwd kernel paid ~3x the
        transcendental cost, which dominates this kernel on the VPU).
        """
        def fwdgrad_kernel(x_ref, *refs):
            w_refs = refs[:n_layers]
            b_refs = refs[n_layers:2 * n_layers]
            out_ref = refs[2 * n_layers]
            dx_ref = refs[2 * n_layers + 1]
            x16 = x_ref[...].astype(bf16)
            acc = jnp.zeros((blk, dims[-2]), f32)
            bias_sum = jnp.zeros((blk, 1), f32)
            dx = jnp.zeros((blk, dims[0]), f32)
            for mi in range(m):
                h = x16
                derivs = []
                for l in range(n_layers - 1):
                    z = (matmul(h, w_refs[l][mi], 'fwd')
                         + b_refs[l][mi])                   # [B, out_l] f32
                    e_z = jnp.exp(z / CELU_ALPHA)
                    h = jnp.where(z > 0, z, CELU_ALPHA * (e_z - 1.0))
                    derivs.append(jnp.where(z > 0, 1.0, e_z))
                w_last = w_refs[n_layers - 1][mi].astype(f32)  # [1, d3]
                acc = acc + h * w_last
                bias_sum = bias_sum + b_refs[n_layers - 1][mi]
                d = jnp.broadcast_to(w_last, (blk, dims[-2]))
                for l in range(n_layers - 2, -1, -1):
                    d = d * derivs[l]
                    d = matmul(d, w_refs[l][mi], 'bwd')
                dx = dx + d
            out_ref[...] = (jnp.sum(acc, axis=1, keepdims=True)
                            + bias_sum) * (1.0 / m)
            dx_ref[...] = dx * (1.0 / m)
        return fwdgrad_kernel

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

    def run_fwdgrad(x, weights, biases):
        n = x.shape[0]
        blk = bwd_block
        return pl.pallas_call(
            make_fwdgrad_kernel(blk), grid=(n // blk,),
            in_specs=[row_spec(blk, dims[0])] + wb_specs(weights, biases),
            out_specs=(row_spec(blk, 1), row_spec(blk, dims[0])),
            out_shape=(jax.ShapeDtypeStruct((n, 1), f32),
                       jax.ShapeDtypeStruct((n, dims[0]), f32)),
            interpret=interpret,
        )(x, *weights, *biases)

    @jax.custom_vjp
    def fused(x, weights, biases):
        # Primal-only calls (no grad) take the cheap fwd kernel; under
        # autodiff jax runs _fwd instead, which fuses the unit-cotangent
        # gradient into the same pass (dx is linear in g, so the saved
        # dx1 closes over no cotangent).
        return run_fwd(x, weights, biases)

    def _fwd(x, weights, biases):
        e, dx1 = run_fwdgrad(x, weights, biases)
        return e, (dx1, jnp.zeros((0,), x.dtype), weights, biases)

    def _bwd(res, g):
        dx1, x_token, weights, biases = res
        dx = g.astype(f32) * dx1
        return (dx.astype(x_token.dtype),
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
