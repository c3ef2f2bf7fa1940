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

import functools
import math
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
                        chunk_size: Optional[int] = None,
                        compute_dtype=None,
                        custom_adjoint: bool = True) -> Array:
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

    ``compute_dtype``: matmul/gather operand dtype. None (default) keeps
    f32 operands (the strict-parity path; XLA runs f32 matmuls as multiple
    MXU passes). ``jnp.bfloat16`` runs the two filter matmuls and the
    neighbor-input gather in bf16 with f32 accumulation — ~1e-3 relative
    output error, inside the reference's golden tolerance (TestCFConv.h:134
    atol 1e-4 rtol 1e-3 applies to f32; bf16 is the production option, like
    the ANI ensemble's nn_dtype).

    ``custom_adjoint`` (default True): use the hand-written chunked VJP —
    the input-gradient uses the operator's SELF-ADJOINTNESS in the inputs
    (the filter depends only on the symmetric r_ij and the list is
    directed-symmetric, so d_inputs = the same conv applied to the output
    cotangent — a gather, where XLA's transpose of the forward gather is a
    14M-row scatter-add at 26k), and the weight/distance gradients are
    recomputed per chunk with fused matmuls. False = plain jax.grad through
    the rematerialized chunk body (the round-4 path, kept for A/B and as
    the oracle for the adjoint parity tests).
    """
    n, k = payload.distances.shape
    # Re-mask by the layer cutoff: the payload may carry a Verlet skin, and
    # the cosine cutoff is only valid for r <= cutoff (it rises again beyond).
    mask = payload.mask & (payload.distances < config.cutoff)
    dist = jnp.where(mask, payload.distances, 0.0)
    idx = jnp.where(mask, payload.indices, n)
    if custom_adjoint:
        dt_name = (None if compute_dtype is None
                   else jnp.dtype(compute_dtype).name)
        conv = _make_payload_conv(config, chunk_size, dt_name)
        return conv(params, dist, mask, idx, inputs)
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


def cfconv_masked(params: CFConvParams, distances: Array, mask: Array,
                  indices: Array, inputs: Array, config: CFConvConfig,
                  chunk_size: Optional[int] = None,
                  compute_dtype=None, bwd_impl: str = 'xla') -> Array:
    """CFConv over an explicit (distances, mask, indices) neighbor triple
    (e.g. ``CellList.payload_distances_from_selection`` — the production
    26k path whose position adjoint is scatter-free). Same math as
    :func:`cfconv_from_payload` with ``custom_adjoint=True``; the filter
    depends on distances only, so no deltas are ever materialized."""
    n = inputs.shape[0]
    m = mask & (distances < config.cutoff)
    dist = jnp.where(m, distances, 0.0)
    idx = jnp.where(m, indices, n)
    dt_name = (None if compute_dtype is None
               else jnp.dtype(compute_dtype).name)
    conv = _make_payload_conv(config, chunk_size, dt_name,
                              bwd_impl=bwd_impl)
    return conv(params, dist, m, idx, inputs)


@functools.lru_cache(maxsize=64)
def _make_payload_conv(config: CFConvConfig, chunk_size: Optional[int],
                       dtype_name: Optional[str], bwd_impl: str = 'xla'):
    """Build the custom-VJP payload conv for one (config, chunk, dtype).

    Forward per chunk of atom rows (B = chunk rows, K lanes, W width,
    G gaussians): gaussian basis -> [BK, G] x [G, W] -> activation ->
    [BK, W] x [W, W] -> cosine cutoff -> multiply by gathered neighbor
    inputs -> sum over K. Matmuls ride the MXU in ``dtype`` with f32
    accumulation.

    Backward per chunk (hand-written; one fused recompute pass, no
    scatter anywhere):

    * d_inputs = conv(params, geometry, g) — self-adjointness: the pair
      matrix A_f[i, j] = sum_l 1[idx[i,l]=j] y2[i,l,f] is SYMMETRIC
      because y2 depends only on r_ij = r_ji and the payload lists both
      directions of every pair (rows gather ``g`` instead of scattering
      cotangents). Broken only when overflow drops one direction — the
      standard soft-failure contract (results must be discarded) covers it.
    * d_w1/b1/w2/b2 and d_distances: the textbook dense-layer adjoints,
      recomputed chunkwise: d_y2 = g x_gathered, back through cutoff,
      w2, activation, w1, gaussians. Distance cotangents chain through
      both the gaussian centers and the cutoff (CpuCFConv.cpp:211-299
      derives the same terms; here they are [BK, *] matmuls).
    """
    if bwd_impl not in ('xla', 'pallas'):
        raise ValueError(f'unknown bwd_impl {bwd_impl!r}')
    dtype = None if dtype_name is None else jnp.dtype(dtype_name)
    rc = float(config.cutoff)
    gw = float(config.gaussian_width)
    act_kind = config.activation

    def _cast(a):
        return a if dtype is None else a.astype(dtype)

    def _mm(a, b):
        return jnp.dot(_cast(a), _cast(b),
                       preferred_element_type=jnp.float32)

    def _filter_fwd(params, d, m):
        """Shared filter pipeline on [B, K] rows; returns intermediates."""
        centers = jnp.asarray(config.gaussian_positions)
        u = (d[..., None] - centers) / gw
        gauss = jnp.exp(-0.5 * u * u)                        # [B, K, G]
        h = _mm(gauss, params.w1) + params.b1
        if act_kind == 'ssp':
            act = jax.nn.softplus(h) - _LN2
        else:
            act = jnp.tanh(h)
        y1 = _mm(act, params.w2) + params.b2                 # [B, K, W]
        fc = jnp.where(m, 0.5 * jnp.cos(math.pi / rc * d) + 0.5, 0.0)
        y2 = y1 * fc[..., None]
        return u, gauss, h, act, y1, fc, y2

    def _chunks(n):
        if chunk_size is None or n <= chunk_size:
            return n, 1, 0
        pad = (-n) % chunk_size
        return chunk_size, (n + pad) // chunk_size, pad

    def _split(x, nb, pad, fill):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)
        return x.reshape((nb, x.shape[0] // nb) + x.shape[1:])

    def _fwd_rows(params, d, m, i, x_pad):
        *_, y2 = _filter_fwd(params, d, m)
        # The neighbor-input gather stays f32: gathering bf16 rows + an
        # explicit upcast measured SLOWER than the f32 gather (348 vs
        # 245 ms fwd at 26k, NOTES_PERF r5) — compute_dtype only routes
        # the MXU matmul operands.
        xg = x_pad[i]                                        # [B, K, W]
        return jnp.sum(y2 * xg, axis=1)

    @jax.custom_vjp
    def conv(params, dist, mask, idx, x):
        n = x.shape[0]
        x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)])
        b, nb, pad = _chunks(n)
        if nb == 1:
            return _fwd_rows(params, dist, mask, idx, x_pad)
        out = jax.lax.map(
            lambda a: _fwd_rows(params, a[0], a[1], a[2], x_pad),
            (_split(dist, nb, pad, 0.0), _split(mask, nb, pad, False),
             _split(idx, nb, pad, n)))
        return out.reshape(nb * b, -1)[:n]

    def _bwd_rows(params, d, m, i, x_pad, g_pad, gc):
        """One chunk of the fused backward. ``gc`` [B, W] is the chunk's
        output cotangent; returns (d_params partials, d_dist chunk,
        d_x rows chunk)."""
        u, gauss, h, act, y1, fc, y2 = _filter_fwd(params, d, m)
        bk = d.shape[0] * d.shape[1]
        w = y1.shape[-1]
        gk = gauss.shape[-1]
        xg = x_pad[i]                                        # [B, K, W]
        gg = g_pad[i]                                        # [B, K, W]
        # Self-adjoint input grad: rows of d_x for THIS chunk's atoms.
        d_x_rows = jnp.sum(y2 * gg, axis=1)                  # [B, W]
        # Filter cotangent from the product rule.
        d_y2 = gc[:, None, :] * xg                           # [B, K, W]
        d_y1 = d_y2 * fc[..., None]
        d_fc = jnp.sum(d_y2 * y1, axis=-1)                   # [B, K]
        d2 = d_y1.reshape(bk, w)
        d_w2 = _mm(act.reshape(bk, w).T, d2)
        d_b2 = jnp.sum(d2, axis=0)
        d_act = _mm(d2, params.w2.T).reshape(h.shape)
        if act_kind == 'ssp':
            d_h = d_act * jax.nn.sigmoid(h)
        else:
            d_h = d_act * (1.0 - act * act)
        dh2 = d_h.reshape(bk, w)
        d_w1 = _mm(gauss.reshape(bk, gk).T, dh2)
        d_b1 = jnp.sum(dh2, axis=0)
        d_gauss = _mm(dh2, params.w1.T).reshape(gauss.shape)
        # d/dd of gauss = gauss * (-u / gw); of fc = -pi/(2 rc) sin(...).
        d_d = jnp.sum(d_gauss * gauss * (-u / gw), axis=-1)
        d_d = d_d + d_fc * jnp.where(
            m, -0.5 * math.pi / rc * jnp.sin(math.pi / rc * d), 0.0)
        return ((d_w1, d_b1, d_w2, d_b2), jnp.where(m, d_d, 0.0), d_x_rows)

    def _conv_fwd(params, dist, mask, idx, x):
        return conv(params, dist, mask, idx, x), (params, dist, mask, idx, x)

    def _bwd_rows_pallas(params, d, m, i, x_pad, g_pad, gc):
        """Fused-kernel chunk backward (ops/pallas_cfconv): same outputs
        as _bwd_rows, with the filter recompute + all adjoint algebra in
        one VMEM-resident pass. The two neighbor gathers stay in XLA."""
        from .pallas_cfconv import make_cfconv_bwd_kernel
        kfn = make_cfconv_bwd_kernel(config, int(d.shape[1]))
        xg = x_pad[i]
        gg = g_pad[i]
        # d carries exact zeros on masked lanes (set by cfconv_masked);
        # the kernel recovers validity as d > 0, so no mask operand.
        del m
        dd, dx, dw1, db1, dw2, db2 = kfn(d, xg, gg, gc, params)
        return (dw1, db1, dw2, db2), dd, dx

    def _conv_bwd(res, g):
        params, dist, mask, idx, x = res
        n, width = x.shape
        x_pad = jnp.concatenate([x, jnp.zeros((1, width), x.dtype)])
        g_pad = jnp.concatenate([g, jnp.zeros((1, width), g.dtype)])
        b, nb, pad = _chunks(n)
        # The fused kernel needs 128-multiple lanes and 16-multiple rows;
        # anything else falls back to the XLA chunk body.
        use_pallas = (bwd_impl == 'pallas' and dist.shape[1] % 128 == 0
                      and (b % 16 == 0 if nb > 1 else n % 16 == 0))
        bwd_rows = _bwd_rows_pallas if use_pallas else _bwd_rows
        if nb == 1:
            dw, d_dist, d_x = bwd_rows(params, dist, mask, idx, x_pad,
                                       g_pad, g)
            return (CFConvParams(*dw), d_dist, None, None, d_x)

        def body(carry, a):
            dw, dd, dx = bwd_rows(params, a[0], a[1], a[2], x_pad, g_pad,
                                  a[3])
            return (tuple(c + p for c, p in zip(carry, dw))), (dd, dx)

        zeros = (jnp.zeros_like(params.w1), jnp.zeros_like(params.b1),
                 jnp.zeros_like(params.w2), jnp.zeros_like(params.b2))
        dw, (d_dist, d_x) = jax.lax.scan(
            body, zeros,
            (_split(dist, nb, pad, 0.0), _split(mask, nb, pad, False),
             _split(idx, nb, pad, n), _split(g, nb, pad, 0.0)))
        d_dist = d_dist.reshape(nb * b, -1)[:n]
        d_x = d_x.reshape(nb * b, -1)[:n]
        return (CFConvParams(*dw), d_dist, None, None, d_x)

    conv.defvjp(_conv_fwd, _conv_bwd)
    return conv


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
