"""Species-wise atomic-network MLP ensembles (the BatchedNN equivalent).

The reference packs the per-species ANI atomic networks into per-atom,
per-model zero-padded weight tensors ``[1, atoms, models, max_out, max_in]``
(BatchedNN.py:66-85) and evaluates four batched mat-vecs
(BatchedNN.cpp:32-35) with CELU(alpha=0.1) between them (BatchedNN.py:97-103).
That layout is a batched *matvec* per atom — bandwidth-bound everywhere.

TPU-first redesign — **species grouping**: an MD system's species assignment
is static, so atoms are permuted into contiguous per-species blocks at trace
time (plain Python). Each species' ensemble layer then becomes one real MXU
matmul ``[n_s, in] x [in, models*out]``, with no zero padding across species
(the reference pads every atom's weights to the max layer size across species,
BatchedNN.py:71-74). The padded reference layout is also provided
(:func:`batched_linear` / :func:`apply_padded_ensemble`) for API parity and as
a cross-check oracle.

Weight/bias gradients are a first-class capability here (the reference
explicitly drops them, BatchedNN.cpp:36-41 — inference only); jax.grad gives
both, which is what enables the training path in ``nnpops_tpu.parallel``.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

CELU_ALPHA = 0.1


@jax.custom_vjp
def _dot_bf16(x: Array, w: Array) -> Array:
    """``x @ w`` with BOTH passes in bf16 (f32 accumulation).

    A plain cast-then-dot only speeds up the forward: jax's transpose feeds
    f32 cotangents into the backward matmuls, which then run at the (3x
    slower) f32 MXU rate. This op keeps the cotangent products in bf16 too.
    """
    return jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _dot_bf16_fwd(x, w):
    return _dot_bf16(x, w), (x, w)


def _dot_bf16_bwd(res, g):
    x, w = res
    g16 = g.astype(jnp.bfloat16)
    dx = jnp.dot(g16, w.astype(jnp.bfloat16).T,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jnp.dot(x.astype(jnp.bfloat16).T, g16,
                 preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


_dot_bf16.defvjp(_dot_bf16_fwd, _dot_bf16_bwd)


@jax.custom_vjp
def _batched_dot_bf16(h: Array, w: Array) -> Array:
    """``[m, n, i] x [m, o, i] -> [m, n, o]`` (contract i, batch m), both
    passes bf16 with f32 accumulation (see _dot_bf16). Model-major layout
    end to end: no transposes anywhere, forward or backward."""
    return jax.lax.dot_general(h.astype(jnp.bfloat16),
                               w.astype(jnp.bfloat16),
                               (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _batched_dot_bf16_fwd(h, w):
    return _batched_dot_bf16(h, w), (h, w)


def _batched_dot_bf16_bwd(res, g):
    h, w = res
    g16 = g.astype(jnp.bfloat16)             # [m, n, o]
    w16 = w.astype(jnp.bfloat16)             # [m, o, i]
    h16 = h.astype(jnp.bfloat16)             # [m, n, i]
    # dh[m, n, i] = sum_o g[m, n, o] w[m, o, i]
    dh = jax.lax.dot_general(g16, w16, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    # dw[m, o, i] = sum_n g[m, n, o] h[m, n, i]  (batch m, contract n).
    dw = jax.lax.dot_general(g16, h16, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    return dh.astype(h.dtype), dw.astype(w.dtype)


_batched_dot_bf16.defvjp(_batched_dot_bf16_fwd, _batched_dot_bf16_bwd)


def celu(x: Array, alpha: float = CELU_ALPHA) -> Array:
    """CELU activation with the ANI alpha=0.1 (BatchedNN.py:98)."""
    return jax.nn.celu(x, alpha=alpha)


class SpeciesNet(NamedTuple):
    """Stacked ensemble weights for one species.

    weights[l]: [models, out_l, in_l]; biases[l]: [models, out_l].
    """
    weights: Tuple[Array, ...]
    biases: Tuple[Array, ...]


class EnsembleParams(NamedTuple):
    """Per-species ensemble networks (index = species id)."""
    networks: Tuple[SpeciesNet, ...]

    @property
    def num_models(self) -> int:
        return self.networks[0].weights[0].shape[0]


def init_ensemble(key, aev_length: int, layer_dims: Sequence[Sequence[int]],
                  num_models: int, dtype=jnp.float32) -> EnsembleParams:
    """Random-init an ensemble (He-style fan-in scaling) for each species.

    layer_dims[s] are the hidden widths for species s; the net is
    aev -> h1 -> ... -> hk -> 1 (the 0/2/4/6 linear structure of
    BatchedNN.py:97-103).
    """
    nets = []
    for dims in layer_dims:
        full = [aev_length, *dims, 1]
        ws, bs = [], []
        for i in range(len(full) - 1):
            key, sub = jax.random.split(key)
            fan_in = full[i]
            w = jax.random.normal(sub, (num_models, full[i + 1], full[i]), dtype) / np.sqrt(fan_in)
            ws.append(w)
            bs.append(jnp.zeros((num_models, full[i + 1]), dtype))
        nets.append(SpeciesNet(tuple(ws), tuple(bs)))
    return EnsembleParams(tuple(nets))


def apply_species_net(net: SpeciesNet, x: Array,
                      compute_dtype=None) -> Array:
    """Run one species' ensemble on its atoms.

    x: [n, aev_length] -> atomic energies [n, models].

    Layer 0 is a single wide MXU matmul [n, in] x [in, models*out0]; deeper
    layers are model-batched matmuls via dot_general (batch dim = models).

    ``compute_dtype``: cast matmul operands (activations + weights) to this
    dtype — ``jnp.bfloat16`` doubles MXU rate and halves weight traffic.
    Accumulation stays f32 (``preferred_element_type``), biases/activations
    apply in f32. Typical force error vs f32 is ~1e-3 relative — inside the
    reference's 5e-3 force gate (TestSymmetryFunctions.py:66-70) but outside
    its 5e-7 energy gate, so this is opt-in (ANIModel ``nn_dtype``).
    """
    bf16 = compute_dtype == jnp.bfloat16
    m, out0, in0 = net.weights[0].shape
    w0 = net.weights[0].transpose(2, 0, 1).reshape(in0, m * out0)
    h = _dot_bf16(x, w0) if bf16 else jnp.dot(
        x, w0, preferred_element_type=jnp.float32)
    # Model-major [m, n, o] from here on: ONE relayout after layer 0, then
    # every deeper matmul (and its VJP) is transpose-free — the per-layer
    # moveaxis of the [n, m, o] layout was pure HBM relayout traffic.
    h = jnp.moveaxis(h.reshape(x.shape[0], m, out0), 0, 1)
    h = h + net.biases[0][:, None, :]
    # In bf16 mode activations stay bf16 BETWEEN layers (matmuls still
    # accumulate f32): at production atom counts the ensemble is
    # activation-traffic bound, not matmul bound, and bf16 halves every
    # store, load, and saved-residual read in the backward pass. Casting
    # BEFORE the activation makes celu's saved residual bf16 as well.
    if bf16:
        h = h.astype(jnp.bfloat16)
    h = celu(h)
    num_layers = len(net.weights)
    for layer in range(1, num_layers):
        w, b = net.weights[layer], net.biases[layer]
        # [m, n, i] x [m, o, i] -> [m, n, o], contracting i, batching m.
        if bf16:
            h = _batched_dot_bf16(h, w)
        else:
            h = jax.lax.dot_general(h, w, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
        h = h + b[:, None, :]
        if layer < num_layers - 1:
            if bf16:
                h = h.astype(jnp.bfloat16)
            h = celu(h)
    return h[:, :, 0].astype(jnp.float32).T  # [n, models]


class SpeciesGrouping(NamedTuple):
    """Static atom-to-species-block permutation, built once per system."""
    order: np.ndarray            # [N] atom indices sorted by species
    counts: Tuple[int, ...]      # atoms per species (static Python ints)
    inverse: np.ndarray          # [N] inverse permutation


def build_grouping(species: np.ndarray, num_species: int) -> SpeciesGrouping:
    species = np.asarray(species)
    order = np.argsort(species, kind='stable').astype(np.int32)
    counts = tuple(int((species == s).sum()) for s in range(num_species))
    inverse = np.empty_like(order)
    inverse[order] = np.arange(len(order), dtype=np.int32)
    return SpeciesGrouping(order, counts, inverse)


def atomic_energies_grouped(params: EnsembleParams, aev: Array,
                            grouping: SpeciesGrouping,
                            compute_dtype=None) -> Array:
    """Per-atom ensemble-mean energies, [N] (in original atom order)."""
    gathered = aev[jnp.asarray(grouping.order)]
    pieces: List[Array] = []
    start = 0
    for s, count in enumerate(grouping.counts):
        if count == 0:
            continue
        block = jax.lax.slice_in_dim(gathered, start, start + count, axis=0)
        pieces.append(apply_species_net(params.networks[s], block,
                                        compute_dtype))
        start += count
    stacked = jnp.concatenate(pieces, axis=0) if len(pieces) > 1 else pieces[0]
    per_atom = jnp.mean(stacked, axis=-1)
    return per_atom[jnp.asarray(grouping.inverse)]


def ensemble_energy(params: EnsembleParams, aev: Array,
                    grouping: SpeciesGrouping,
                    compute_dtype=None) -> Array:
    """Total NN energy: sum over atoms of the model-mean atomic energy
    (the fused sum/mean of BatchedNN.py:105-109)."""
    return jnp.sum(atomic_energies_grouped(params, aev, grouping,
                                           compute_dtype))


def ensemble_energy_grouped_rows(params: EnsembleParams, aev: Array,
                                 counts: Sequence[int],
                                 compute_dtype=None) -> Array:
    """Total NN energy when the AEV rows are ALREADY species-grouped
    (``counts[s]`` contiguous rows per species, ascending species order) —
    no per-step row gather at all. The blocked pipeline produces its rows in
    this order directly (``payload_from_blocked(row_order=...)``)."""
    total = jnp.zeros((), jnp.float32)
    start = 0
    for s, count in enumerate(counts):
        if count == 0:
            continue
        block = jax.lax.slice_in_dim(aev, start, start + count, axis=0)
        e = apply_species_net(params.networks[s], block, compute_dtype)
        total = total + jnp.sum(jnp.mean(e, axis=-1))
        start += count
    return total


# ---------------------------------------------------------------------------
# Reference-layout (padded per-atom) path: API parity with BatchedNN.


def batched_linear(x: Array, weights: Array, biases: Array) -> Array:
    """The BatchedLinear op: ``matmul(W, x) + b`` with per-atom, per-model
    weights (BatchedNN.cpp:32-35).

    x: [mols, atoms, models, in, 1]; weights: [1, atoms, models, out, in];
    biases: [1, atoms, models, out, 1] -> [mols, atoms, models, out, 1].
    Unlike the reference, this is fully differentiable (including W and b).
    """
    return jnp.matmul(weights, x) + biases


def pad_ensemble(params: EnsembleParams, species: np.ndarray) -> Tuple[Tuple[Array, Array], ...]:
    """Expand grouped parameters to the reference's padded per-atom layout
    ``[1, atoms, models, max_out, max_in]`` (BatchedNN.py:77-85)."""
    num_layers = len(params.networks[0].weights)
    out = []
    for layer in range(num_layers):
        max_out = max(net.weights[layer].shape[1] for net in params.networks)
        max_in = max(net.weights[layer].shape[2] for net in params.networks)
        m = params.num_models
        ws, bs = [], []
        for s in species:
            w = params.networks[int(s)].weights[layer]
            b = params.networks[int(s)].biases[layer]
            wpad = jnp.zeros((m, max_out, max_in), w.dtype).at[:, :w.shape[1], :w.shape[2]].set(w)
            bpad = jnp.zeros((m, max_out), b.dtype).at[:, :b.shape[1]].set(b)
            ws.append(wpad)
            bs.append(bpad)
        out.append((jnp.stack(ws)[None], jnp.stack(bs)[None][..., None]))
    return tuple(out)


def apply_padded_ensemble(padded_layers, aev: Array) -> Array:
    """Evaluate the padded layout exactly like _BatchedNN.forward
    (BatchedNN.py:90-111). aev: [mols, atoms, features] -> energies [mols]."""
    x = aev[:, :, None, :, None]
    num_layers = len(padded_layers)
    for i, (w, b) in enumerate(padded_layers):
        x = batched_linear(x, w, b)
        if i < num_layers - 1:
            x = celu(x)
    num_models = x.shape[2]
    return jnp.sum(x, axis=(1, 2, 3, 4)) / num_models
