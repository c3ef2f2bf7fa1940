"""A SchNet-style model family built on the CFConv op.

The reference ships only the CFConv kernel + neighbor list and benchmarks a
6-layer stack (BenchmarkCudaCFConv.cu:105-111); the surrounding model lives in
SchNetPack. For a complete framework we provide both:

* :class:`CFConvStack` — exactly the benchmark workload: one neighbor build +
  L convolutions sharing the list.
* :class:`SchNetModel` — a full SchNet potential: species embedding ->
  interaction blocks (atomwise dense, CFConv, atomwise dense + residual) ->
  per-atom readout -> summed energy, all one jitted program with forces from
  jax.grad.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CFConvConfig
from ..neighbors.pairs import MaskedPairs
from ..ops.cfconv import (CFConvParams, build_cfconv_neighbors, cfconv,
                          init_cfconv, shifted_softplus)

Array = jnp.ndarray


class CFConvStack:
    """The reference benchmark workload: L CFConv layers over one shared
    neighbor list (schnet/CFConv.h:28-32, BenchmarkCudaCFConv.cu:105-111)."""

    def __init__(self, config: CFConvConfig, num_layers: int = 6):
        self.config = config
        self.num_layers = num_layers

    def init(self, key) -> Tuple[CFConvParams, ...]:
        keys = jax.random.split(key, self.num_layers)
        return tuple(init_cfconv(k, self.config) for k in keys)

    def __call__(self, params: Tuple[CFConvParams, ...], neighbors: MaskedPairs,
                 inputs: Array) -> Array:
        x = inputs
        for p in params:
            x = cfconv(p, neighbors, x, self.config)
        return x

    def apply_payload(self, params: Tuple[CFConvParams, ...], payload,
                      inputs: Array, chunk_size=None, compute_dtype=None,
                      custom_adjoint: bool = True) -> Array:
        """The same L-layer stack over a cell-list neighbor payload — the
        O(N) production path for large periodic boxes (the reference stack
        is O(N^2)-built and non-periodic, BenchmarkCudaCFConv.cu:63-116,
        CFConv.cpp:131). One payload build serves all layers, exactly like
        the shared CFConvNeighbors of schnet/CFConv.h:28-32.

        ``compute_dtype``/``custom_adjoint``: see
        :func:`nnpops_tpu.ops.cfconv.cfconv_from_payload` — bf16 matmuls
        with f32 accumulation and the scatter-free hand-written adjoint are
        the production configuration."""
        from ..ops.cfconv import cfconv_from_payload
        x = inputs
        for p in params:
            x = cfconv_from_payload(p, payload, x, self.config, chunk_size,
                                    compute_dtype=compute_dtype,
                                    custom_adjoint=custom_adjoint)
        return x

    def apply_distances(self, params: Tuple[CFConvParams, ...],
                        distances: Array, indices: Array, mask: Array,
                        inputs: Array, chunk_size=None,
                        compute_dtype=None) -> Array:
        """The L-layer stack over an explicit (distances, indices, mask)
        triple — pair it with ``CellList.select(build_mirror=True)`` +
        ``payload_distances_from_selection`` for the scatter-free
        production path at large N (NOTES_PERF round 5: the AD payload
        adjoint alone cost 280 ms of the 26k CFConv step)."""
        from ..ops.cfconv import cfconv_masked
        x = inputs
        for p in params:
            x = cfconv_masked(p, distances, mask, indices, x, self.config,
                              chunk_size, compute_dtype=compute_dtype)
        return x


class DenseParams(NamedTuple):
    w: Array
    b: Array


class InteractionParams(NamedTuple):
    atomwise_in: DenseParams     # width -> width (pre-conv mixing)
    conv: CFConvParams
    atomwise_out1: DenseParams   # width -> width, ssp
    atomwise_out2: DenseParams   # width -> width (residual update)


class SchNetParams(NamedTuple):
    embedding: Array                     # [num_species, width]
    interactions: Tuple[InteractionParams, ...]
    readout1: DenseParams                # width -> width//2, ssp
    readout2: DenseParams                # width//2 -> 1


def _dense_init(key, n_in, n_out) -> DenseParams:
    w = jax.random.normal(key, (n_in, n_out), jnp.float32) / np.sqrt(n_in)
    return DenseParams(w, jnp.zeros((n_out,), jnp.float32))


def _dense(p: DenseParams, x: Array) -> Array:
    return jnp.dot(x, p.w, preferred_element_type=jnp.float32) + p.b


@dataclasses.dataclass(frozen=True)
class SchNetModel:
    """SchNet potential: embedding + L interaction blocks + atomwise readout."""
    config: CFConvConfig
    num_species: int
    num_interactions: int = 3

    def init(self, key) -> SchNetParams:
        keys = jax.random.split(key, 3 + 4 * self.num_interactions)
        width = self.config.width
        embedding = jax.random.normal(keys[0], (self.num_species, width),
                                      jnp.float32)
        blocks = []
        for i in range(self.num_interactions):
            k = keys[3 + 4 * i: 7 + 4 * i]
            blocks.append(InteractionParams(
                atomwise_in=_dense_init(k[0], width, width),
                conv=init_cfconv(k[1], self.config),
                atomwise_out1=_dense_init(k[2], width, width),
                atomwise_out2=_dense_init(k[3], width, width),
            ))
        return SchNetParams(embedding, tuple(blocks),
                            _dense_init(keys[1], width, width // 2),
                            _dense_init(keys[2], width // 2, 1))

    def energy(self, params: SchNetParams, positions: Array, species: Array,
               box: Optional[Array] = None, max_num_pairs: int = -1) -> Array:
        neighbors = build_cfconv_neighbors(positions, self.config.cutoff, box,
                                           max_num_pairs)
        x = params.embedding[species]
        for block in params.interactions:
            v = _dense(block.atomwise_in, x)
            v = cfconv(block.conv, neighbors, v, self.config)
            v = shifted_softplus(_dense(block.atomwise_out1, v))
            v = _dense(block.atomwise_out2, v)
            x = x + v                      # residual interaction update
        h = shifted_softplus(_dense(params.readout1, x))
        per_atom = _dense(params.readout2, h)[:, 0]
        return jnp.sum(per_atom)

    def energy_and_forces(self, params: SchNetParams, positions: Array,
                          species: Array, box: Optional[Array] = None,
                          max_num_pairs: int = -1) -> Tuple[Array, Array]:
        e, g = jax.value_and_grad(self.energy, argnums=1)(
            params, positions, species, box, max_num_pairs)
        return e, -g
