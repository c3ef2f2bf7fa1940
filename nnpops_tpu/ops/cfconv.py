"""SchNet continuous-filter convolution (CFConv) in pure JAX.

Math follows the reference pipeline (schnet/CFConv.h:92-101): per neighbor
pair, (1) Gaussian basis of the distance, (2) dense layer, (3) shifted-softplus
or tanh activation (CFConv.h:114-123), (4) second dense layer, (5) cosine
cutoff; each atom's output is the sum over neighbors of the filter times the
neighbor's input vector.

TPU-first redesign: the reference walks a per-atom neighbor list with a
warp-per-pair kernel and atomicAdd scatter (CudaCFConv.cu:283-350); here the
half pair list is a static-capacity masked array, the two dense layers are
batched [P, G] x [G, W] and [P, W] x [W, W] MXU matmuls over all pairs at
once, and the symmetric accumulation is a deterministic ``segment_sum``.
Backprop (input and position gradients, CpuCFConv.cpp:211-299) is jax.grad —
including gradients w.r.t. the filter weights, which the reference cannot
produce at all.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CFConvConfig
from ..geometry import cosine_cutoff
from ..neighbors.pairs import MaskedPairs, neighbor_pairs_masked

Array = jnp.ndarray

_LN2 = float(np.log(2.0))


def shifted_softplus(x: Array) -> Array:
    """``log(0.5*exp(x) + 0.5)`` = softplus(x) - log 2 (CFConv.h:115-118),
    in the overflow-safe softplus form."""
    return jax.nn.softplus(x) - _LN2


class CFConvParams(NamedTuple):
    """Filter-network parameters.

    w1: [num_gaussians, width]; b1: [width]; w2: [width, width]; b2: [width]
    ([in, out] layout — transpose of the reference's row-major [out, in],
    CpuCFConv.cpp:123-126, so the pair-batched matmul is contiguous).
    """
    w1: Array
    b1: Array
    w2: Array
    b2: Array

    @classmethod
    def from_reference_layout(cls, w1, b1, w2, b2) -> 'CFConvParams':
        """Build from the reference's [out, in] row-major weights."""
        return cls(jnp.asarray(w1).T, jnp.asarray(b1),
                   jnp.asarray(w2).T, jnp.asarray(b2))


def init_cfconv(key, config: CFConvConfig, dtype=jnp.float32) -> CFConvParams:
    k1, k2 = jax.random.split(key)
    g, w = config.num_gaussians, config.width
    return CFConvParams(
        w1=jax.random.normal(k1, (g, w), dtype) / np.sqrt(g),
        b1=jnp.zeros((w,), dtype),
        w2=jax.random.normal(k2, (w, w), dtype) / np.sqrt(w),
        b2=jnp.zeros((w,), dtype),
    )


def build_cfconv_neighbors(positions: Array, cutoff: float,
                           box: Optional[Array] = None,
                           max_num_pairs: int = -1) -> MaskedPairs:
    """The CFConvNeighbors equivalent (schnet/CFConv.h:28-57): build once per
    position change, share across every CFConv layer in the model."""
    return neighbor_pairs_masked(positions, cutoff, max_num_pairs, box)


def pair_filters(params: CFConvParams, distances: Array, mask: Array,
                 config: CFConvConfig) -> Array:
    """The per-pair filter y2 [P, width]: gaussians -> dense -> activation ->
    dense -> cosine cutoff (CpuCFConv.cpp:151-178)."""
    centers = jnp.asarray(config.gaussian_positions)
    x = (distances[..., None] - centers) / config.gaussian_width
    gauss = jnp.exp(-0.5 * x * x)                                     # [..., G]
    h = jnp.dot(gauss, params.w1, preferred_element_type=jnp.float32) + params.b1
    h = shifted_softplus(h) if config.activation == 'ssp' else jnp.tanh(h)
    y = jnp.dot(h, params.w2, preferred_element_type=jnp.float32) + params.b2
    y = y * cosine_cutoff(distances, config.cutoff)[..., None]
    return jnp.where(mask[..., None], y, 0.0)


def cfconv_from_payload(params: CFConvParams, payload, inputs: Array,
                        config: CFConvConfig,
                        chunk_size: Optional[int] = None) -> Array:
    """CFConv over a directed per-atom neighbor payload (CellList.build_payload).

    O(N) alternative to the half-pair-list path for large periodic systems
    (the reference's CFConv neighbor search is O(N^2) and its binding
    hardcodes periodic=false, CFConv.cpp:131). The directed list covers both
    directions of every pair, so the symmetric accumulation of
    CpuCFConv.cpp:182-185 is a plain per-atom masked sum; neighbor input
    vectors are fetched with one [N, K] gather per layer (the only dynamic
    indexing left — the geometry rides in the payload).

    ``chunk_size``: process atom rows in blocks under ``lax.map``, bounding
    the [rows, K, width] filter intermediate (26k atoms x ~450 lanes at a
    10 A cutoff x width 128 would otherwise be a 6 GB tensor).
    """
    n, k = payload.distances.shape
    # Re-mask by the layer cutoff: the payload may carry a Verlet skin, and
    # the cosine cutoff is only valid for r <= cutoff (it rises again beyond).
    mask = payload.mask & (payload.distances < config.cutoff)
    dist = jnp.where(mask, payload.distances, 0.0)
    idx = jnp.where(mask, payload.indices, n)
    inputs_pad = jnp.concatenate([inputs, jnp.zeros((1, inputs.shape[1]),
                                                    inputs.dtype)])

    def rows(d, m, i):
        y2 = pair_filters(params, d, m, config)              # [rows, K, W]
        return jnp.sum(y2 * inputs_pad[i], axis=1)

    if chunk_size is None or n <= chunk_size:
        return rows(dist, mask, idx)
    pad = (-n) % chunk_size
    nb = (n + pad) // chunk_size

    def blocks(x, fill):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad, k), fill, x.dtype)], axis=0)
        return x.reshape(nb, chunk_size, k)

    # Remat the chunk body: without it, autodiff saves every chunk's
    # [chunk, K, width] filter tensor as a scan residual — at 26k atoms /
    # 10 A cutoff that is 13 x ~570 MB plus XLA's transpose clones (measured
    # 234 GB requested, OOM). Recomputing the filters in the backward keeps
    # the residuals at the [chunk, K] geometry arrays.
    out = jax.lax.map(
        jax.checkpoint(lambda args: rows(*args)),
        (blocks(dist, 0.0), blocks(mask, False), blocks(idx, n)))
    return out.reshape(nb * chunk_size, -1)[:n]


def cfconv(params: CFConvParams, neighbors: MaskedPairs, inputs: Array,
           config: CFConvConfig) -> Array:
    """Continuous-filter convolution over a shared half pair list.

    inputs: [N, width] -> outputs: [N, width]. Each half pair contributes to
    both endpoints (CpuCFConv.cpp:182-185), realized as one deterministic
    segment_sum over the doubled directed list.
    """
    num_atoms = inputs.shape[0]
    y2 = pair_filters(params, neighbors.distances, neighbors.mask, config)
    messages = jnp.concatenate([y2 * inputs[neighbors.atom2],
                                y2 * inputs[neighbors.atom1]], axis=0)
    targets = jnp.concatenate([neighbors.atom1, neighbors.atom2], axis=0)
    return jax.ops.segment_sum(messages, targets, num_segments=num_atoms)
