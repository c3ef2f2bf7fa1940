"""ANI symmetry functions (atomic environment vectors) in pure JAX.

TPU-native re-design of the reference ANI kernels
(``src/ani/CpuANISymmetryFunctions.cpp``, ``src/ani/CudaANISymmetryFunctions.cu``):

* The math follows the reference exactly: cosine cutoff (CpuANISymmetryFunctions
  .cpp:381-383), radial ``fc(r) * exp(-eta*(r-rs)^2)`` accumulated per neighbor
  species (:141-147), angular ``fc(r12)*fc(r13) * (1+cos(theta-ts))^zeta *
  exp(-eta*(rmean-rs)^2)`` accumulated per unordered species pair (:183-190),
  TorchANI-mode radial x0.25 and dot x0.95 (:99-103, :392-393), and the
  ``2^(1-zeta)`` angular scale (:104-109).
* The *implementation* is entirely different: instead of hand-written forward +
  analytic-backprop kernel pairs with atomics (CudaANISymmetryFunctions.cu:408-596),
  the forward pass is a masked dense computation over a static-capacity
  per-atom neighbor list, and forces come from ``jax.grad``. The per-species
  and per-species-pair scatter is expressed as one-hot contractions, which XLA
  lowers to MXU matmuls (a [T,A]x[T,P] batched contraction per atom).
* Shapes are fully static: neighbor lists are padded to capacity K with the
  sentinel index N, angular neighbors to K_ang, triples are the static
  triangular enumeration of K_ang — so one jitted program serves every MD step
  (the CUDA-graph contract of the reference, SURVEY §2.3, holds by construction).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ANIBasis
from ..geometry import cosine_cutoff, minimum_image
from .compaction import compact_rows

Array = jnp.ndarray


class AEV(NamedTuple):
    radial: Array    # [N, S * R]
    angular: Array   # [N, P * A], P = S(S+1)/2


def species_pair_index(num_species: int) -> np.ndarray:
    """Map (species_i, species_j) -> unordered-pair symmetry-function index.

    Same enumeration as the reference's ``angularIndex`` table
    (CpuANISymmetryFunctions.cpp:39-43): index increments over (i, j >= i).
    """
    s = num_species
    table = np.zeros((s, s), dtype=np.int32)
    idx = 0
    for i in range(s):
        for j in range(i, s):
            table[i, j] = table[j, i] = idx
            idx += 1
    return table


def dense_neighbor_list(num_atoms: int) -> np.ndarray:
    """The trivial all-atoms neighbor list: for each atom, every other atom.

    [N, N-1] int32. This is the O(N^2) regime the reference targets for small
    molecules (CpuANISymmetryFunctions.cpp:114-116); large systems use the
    cell-list builder instead.
    """
    n = num_atoms
    idx = np.arange(n, dtype=np.int32)
    # Row i: 0..n-1 excluding i.
    full = np.broadcast_to(idx, (n, n))
    mask = full != idx[:, None]
    return full[mask].reshape(n, n - 1).copy()


def _pow(base: Array, exponent: Array) -> Array:
    """``base ** exponent`` for base >= 0 with well-defined value/grad at 0."""
    base = jnp.maximum(base, 0.0)
    return jnp.power(base, exponent)


def compute_aev(
    positions: Array,
    species: Array,
    basis: ANIBasis,
    box: Optional[Array] = None,
    neighbors: Optional[Array] = None,
    angular_capacity: Optional[int] = None,
    centers: Optional[Array] = None,
) -> AEV:
    """Compute radial and angular symmetry functions for every atom.

    Args:
      positions: [N, 3] float32 atom positions.
      species: [N] int32 species indices in [0, num_species).
      basis: the symmetry-function basis (static).
      box: optional [3, 3] reduced box vectors for periodic systems.
      neighbors: optional [N, K] int32 per-atom neighbor candidate list padded
        with the sentinel N. Defaults to the dense all-atoms list. Entries
        must be *directed* (if j lists i, i lists j) and may include atoms
        beyond the cutoff — they are masked by distance here.
      angular_capacity: cap on per-atom neighbors used for the angular triples
        (defaults to K). Compaction keeps neighbors within the angular cutoff;
        if an atom has more true angular neighbors than the cap, the extra
        contributions are dropped (capacity-overflow contract — callers size
        the cap from the physics like the reference sizes max_num_pairs).
      centers: optional [Nc] int32 — compute AEVs only for these center atoms
        (rows of ``neighbors`` then correspond to centers). This is the hook
        for atom-axis (SP) sharding: each device passes its block of centers
        with replicated positions. Defaults to all atoms.

    Returns:
      AEV(radial [Nc, S*R], angular [Nc, P*A]) matching the reference layout
      (ANISymmetryFunctions.h:73-76 plus the flattened concatenation of
      SymmetryFunctions.py:120-122).
    """
    num_atoms = positions.shape[0]
    s = basis.num_species
    if neighbors is None:
        neighbors = jnp.asarray(dense_neighbor_list(num_atoms))
    if centers is not None:
        neighbors = neighbors[centers]
        center_positions = positions[centers]
    else:
        center_positions = positions
    num_centers = neighbors.shape[0]
    k = neighbors.shape[1]
    k_ang = angular_capacity if angular_capacity is not None else k
    k_ang = min(k_ang, k)

    dtype = positions.dtype
    r_eta = jnp.asarray(basis.radial_eta, dtype)
    r_rs = jnp.asarray(basis.radial_rs, dtype)
    a_eta = jnp.asarray(basis.angular_eta, dtype)
    a_rs = jnp.asarray(basis.angular_rs, dtype)
    a_zeta = jnp.asarray(basis.angular_zeta, dtype)
    a_ts = jnp.asarray(basis.angular_thetas, dtype)

    in_range = neighbors < num_atoms
    safe_idx = jnp.where(in_range, neighbors, 0)
    # delta[n, k] points from atom n to its neighbor (pos2 - pos1, matching
    # computeDisplacement at CpuANISymmetryFunctions.cpp:355-359).
    delta = positions[safe_idx] - center_positions[:, None, :]
    delta = minimum_image(delta, box)
    r2 = jnp.sum(delta * delta, axis=-1)

    rc, ra = basis.radial_cutoff, basis.angular_cutoff
    valid_r = in_range & (r2 < rc * rc)
    safe_r2 = jnp.where(valid_r, r2, 1.0)
    r = jnp.sqrt(safe_r2)

    # ---- Radial block: contributions scattered per neighbor species via a
    # one-hot contraction (MXU) instead of atomics.
    fc = cosine_cutoff(r, rc)
    shifted = r[..., None] - r_rs               # [N, K, R]
    radial_pair = fc[..., None] * jnp.exp(-r_eta * shifted * shifted)
    radial_pair = jnp.where(valid_r[..., None], radial_pair, 0.0)
    neighbor_onehot = jax.nn.one_hot(species[safe_idx], s, dtype=dtype)
    neighbor_onehot = neighbor_onehot * valid_r[..., None]
    radial = jnp.einsum('nkr,nks->nsr', radial_pair, neighbor_onehot,
                        precision=jax.lax.Precision.HIGH)
    if basis.torchani:
        radial = radial * 0.25

    # ---- Angular block. Compact each atom's angular-cutoff neighbors to the
    # front of a K_ang slot list (stable, deterministic; prefix-sum + binary
    # search instead of a TPU-hostile sort, see ops/compaction.py).
    valid_a = in_range & (r2 < ra * ra)
    if k_ang < k:
        take, kept = compact_rows(valid_a, k_ang)
        ang_idx = jnp.take_along_axis(safe_idx, take, axis=1)
        ang_valid = kept
        ang_delta = jnp.take_along_axis(delta, take[..., None], axis=1)
    else:
        ang_idx, ang_valid, ang_delta = safe_idx, valid_a, delta

    jj, kk = np.triu_indices(k_ang, k=1)
    jj = jnp.asarray(jj, jnp.int32)
    kk = jnp.asarray(kk, jnp.int32)

    d1 = ang_delta[:, jj, :]                    # [N, T, 3]
    d2 = ang_delta[:, kk, :]
    tri_valid = ang_valid[:, jj] & ang_valid[:, kk]
    r2_1 = jnp.sum(d1 * d1, axis=-1)
    r2_2 = jnp.sum(d2 * d2, axis=-1)
    safe1 = jnp.where(tri_valid, r2_1, 1.0)
    safe2 = jnp.where(tri_valid, r2_2, 1.0)
    r1 = jnp.sqrt(safe1)
    r2_ = jnp.sqrt(safe2)
    dot = jnp.sum(d1 * d2, axis=-1)
    dot = jnp.where(tri_valid, dot, 0.0)

    # The angle enters only through cos(theta - ts). Work directly with
    # (cos theta, sin theta) and the addition formula — no acos/atan2 at all:
    # TorchANI mode defines theta = acos(0.95 * cos) (CpuANISymmetryFunctions
    # .cpp:392-394), i.e. cos theta = 0.95*dot/(r1*r2), sin theta =
    # sqrt(1 - cos^2) (>= 0.31, gradient-safe); publication mode uses the
    # exact angle, cos = dot/(r1*r2), sin = |cross|/(r1*r2) (eps-guarded).
    r1r2 = r1 * r2_
    if basis.torchani:
        cos_t = jnp.clip(0.95 * dot / r1r2, -0.95, 0.95)
        sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
    else:
        cos_t = dot / r1r2
        cross = jnp.cross(d1, d2)
        cross_sq = jnp.sum(cross * cross, axis=-1)
        cross_sq = jnp.where(tri_valid, cross_sq, 1.0)
        eps = jnp.asarray(1e-12, dtype)
        sin_t = jnp.sqrt(jnp.maximum(cross_sq, eps)) / r1r2

    r_mean = 0.5 * (r1 + r2_)
    fc2 = cosine_cutoff(r1, ra) * cosine_cutoff(r2_, ra)
    if basis.angular_rs_grid is not None:
        # Factored product-grid path (single eta/zeta): evaluate the Z
        # theta-shift factors and the R radial-shift factors separately and
        # combine by outer product — ~6x fewer transcendentals per triple
        # than the flat path, and the flat [N,T,A] intermediate shrinks to
        # [N,T,Z] + [N,T,R]. Layout matches from_grids (rs-major, then ts).
        ts_grid = jnp.asarray(basis.angular_thetas_grid, dtype)
        rs_grid = jnp.asarray(basis.angular_rs_grid, dtype)
        zeta0 = basis.angular_zeta[0]
        eta0 = basis.angular_eta[0]
        cos_tm = (cos_t[..., None] * jnp.cos(ts_grid)
                  + sin_t[..., None] * jnp.sin(ts_grid))          # [N, T, Z]
        cos_pow = _pow(1.0 + cos_tm, zeta0)
        shifted_a = r_mean[..., None] - rs_grid                   # [N, T, R]
        exp_term = fc2[..., None] * jnp.exp(-eta0 * shifted_a * shifted_a)
        tri_term = (exp_term[..., :, None] * cos_pow[..., None, :]).reshape(
            *cos_t.shape, len(basis.angular_rs_grid) * len(basis.angular_thetas_grid))
    else:
        # Flat path: arbitrary per-function (eta, rs, zeta, thetas).
        cos_tm = cos_t[..., None] * jnp.cos(a_ts) + sin_t[..., None] * jnp.sin(a_ts)
        cos_term = _pow(1.0 + cos_tm, a_zeta)                     # [N, T, A]
        shifted_a = r_mean[..., None] - a_rs
        exp_term = jnp.exp(-a_eta * shifted_a * shifted_a)
        tri_term = fc2[..., None] * cos_term * exp_term
    tri_term = jnp.where(tri_valid[..., None], tri_term, 0.0)

    # Unordered-species-pair one-hot: [N, T, P] (MXU contraction partner).
    pair_table = jnp.asarray(species_pair_index(s))
    sp1 = species[ang_idx[:, jj]]
    sp2 = species[ang_idx[:, kk]]
    pair_idx = pair_table[sp1, sp2]
    num_pairs = basis.num_species_pairs
    pair_onehot = jax.nn.one_hot(pair_idx, num_pairs, dtype=dtype)
    pair_onehot = pair_onehot * tri_valid[..., None]
    angular = jnp.einsum('nta,ntp->npa', tri_term, pair_onehot,
                        precision=jax.lax.Precision.HIGH)
    angular = angular * _pow(2.0, 1.0 - a_zeta)

    return AEV(radial.reshape(num_centers, -1), angular.reshape(num_centers, -1))


def max_angular_neighbors(payload, angular_cutoff: float) -> Array:
    """TRUE per-atom maximum of neighbors within the angular cutoff — the
    observable counterpart of the ``angular_capacity`` truncation in
    :func:`compute_aev_from_payload` (which keeps only the K_ang nearest and
    silently drops the rest). Compare against the capacity between scan
    segments, exactly like ``NeighborList.max_neighbors`` vs K — the
    ``number_found_pairs`` contract (getNeighborPairs.py:77-83) extended to
    the angular list."""
    within = payload.mask & (payload.distances < angular_cutoff)
    return jnp.max(jnp.sum(within.astype(jnp.int32), axis=1))


def _selection_matrix(idx: np.ndarray, k: int, dtype) -> Array:
    """Constant 0/1 matrix S with S[t, idx[t]] = 1 — static reindexing
    expressed as an MXU matmul instead of a gather."""
    sel = np.zeros((len(idx), k), dtype=np.float32)
    sel[np.arange(len(idx)), idx] = 1.0
    return jnp.asarray(sel, dtype)


def compute_aev_from_payload(payload, basis: ANIBasis,
                             angular_capacity: int,
                             chunk_size: Optional[int] = None,
                             contraction_dtype=None,
                             angular_impl: str = 'ordered3') -> AEV:
    """Gather-free AEV from a payload-carrying neighbor list.

    ``payload`` is a ``CellList.build_payload`` result whose features are the
    per-neighbor species one-hot [N, K, S]. Everything the angular block
    needs is re-expressed without dynamic indexing: compaction to K_ang is a
    key-only sort + one take, triple expansion uses constant selection
    matmuls, and the species-pair reduction runs in the ordered-species basis
    (wide MXU tiles). Same math as :func:`compute_aev` (golden-tested).

    ``chunk_size``: process atoms in blocks of this size under ``lax.map`` —
    bounds the live [chunk, T, A] angular intermediates (1.6 GB-class at 26k
    atoms otherwise) in both the forward and backward pass. N must be padded
    to a multiple (the payload's own padding rows are fine to include).

    ``contraction_dtype``: cast the species-scatter contraction operands
    (one-hots are exact in any dtype; the per-pair/per-triple term tensors
    lose mantissa) — ``jnp.bfloat16`` halves the dominant memory traffic and
    doubles MXU rate, at ~1e-3-relative feature error. Accumulation stays
    f32. Opt-in; f32 (None) is the default and what the golden tests gate.
    """
    if chunk_size is not None and payload.distances.shape[0] > chunk_size:
        n = payload.distances.shape[0]
        pad = (-n) % chunk_size
        def body(args):
            d, dist, oh, m = args
            from ..neighbors.cell_list import NeighborPayload
            chunk = NeighborPayload(d, dist, oh, None, m,
                                    payload.max_neighbors,
                                    payload.max_cell_occupancy)
            return compute_aev_from_payload(chunk, basis, angular_capacity,
                                            contraction_dtype=contraction_dtype,
                                            angular_impl=angular_impl)
        def padded(x):
            if pad == 0:
                return x
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        args = (padded(payload.deltas), padded(payload.distances),
                padded(payload.features), padded(payload.mask))
        args = jax.tree_util.tree_map(
            lambda x: x.reshape((-1, chunk_size) + x.shape[1:]), args)
        out = jax.lax.map(body, args)
        radial = out.radial.reshape(-1, out.radial.shape[-1])[:n]
        angular = out.angular.reshape(-1, out.angular.shape[-1])[:n]
        return AEV(radial, angular)

    deltas, r, onehot, mask = (payload.deltas, payload.distances,
                               payload.features, payload.mask)
    n, k = r.shape
    s = basis.num_species
    dtype = deltas.dtype
    rc, ra = basis.radial_cutoff, basis.angular_cutoff

    r_eta = jnp.asarray(basis.radial_eta, dtype)
    r_rs = jnp.asarray(basis.radial_rs, dtype)

    # ---- Radial block. Re-mask by the true radial cutoff: the payload may
    # have been built with a Verlet skin (cell cutoff = rc + skin).
    mask = mask & (r < rc)
    safe_r = jnp.where(mask, r, 1.0)
    fc = cosine_cutoff(safe_r, rc)
    shifted = safe_r[..., None] - r_rs
    radial_pair = fc[..., None] * jnp.exp(-r_eta * shifted * shifted)
    radial_pair = jnp.where(mask[..., None], radial_pair, 0.0)
    cdt = contraction_dtype or dtype
    radial = jnp.einsum('nkr,nks->nsr', radial_pair.astype(cdt),
                        (onehot * mask[..., None]).astype(cdt),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
    if basis.torchani:
        radial = radial * 0.25

    # ---- Angular block: compaction to K_ang. Sort only a stop_gradient key
    # with a position index (a differentiable sort's VJP transposes the whole
    # sorting network — catastrophic), then fetch the payload with one
    # take_along_axis whose VJP is a single scatter.
    k_ang = min(angular_capacity, k)
    valid_a = mask & (r < ra)
    key = jnp.where(valid_a, jax.lax.stop_gradient(r), jnp.inf)
    iota = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :], key.shape)
    key_s, src = jax.lax.sort([key, iota.astype(jnp.float32)],
                              dimension=1, num_keys=1)
    ang_valid = jnp.isfinite(key_s[:, :k_ang])
    take = src[:, :k_ang].astype(jnp.int32)
    ang_delta = jnp.take_along_axis(deltas, take[..., None], axis=1)
    ang_delta = jnp.where(ang_valid[..., None], ang_delta, 0.0)
    ang_oh = jnp.take_along_axis(onehot, take[..., None], axis=1)
    ang_oh = jnp.where(ang_valid[..., None], ang_oh, 0.0)
    r_a = jnp.take_along_axis(r, take, axis=1)
    r_a = jnp.where(ang_valid, r_a, 1.0)

    if angular_impl == 'dense':
        # Dense-pair formulation: all angular quantities live on the full
        # [N, K_ang, K_ang] neighbor-pair matrix (upper triangle masked) —
        # pure broadcasts from the [N, K_ang] arrays, NO triple-selection
        # machinery at all. ~2x the elements of the triangular enumeration
        # but every selection einsum/gather disappears, and the species-pair
        # contraction factorizes into two K_ang-contractions with wide
        # output tiles (measured several-fold faster at 26k atoms).
        tri_valid = (ang_valid[:, :, None] & ang_valid[:, None, :]
                     & (jnp.arange(k_ang)[:, None] < jnp.arange(k_ang)[None, :]))
        dot = jnp.einsum('njx,nkx->njk', ang_delta, ang_delta,
                        precision=jax.lax.Precision.HIGH)
        dot = jnp.where(tri_valid, dot, 0.0)
        r1 = r_a[:, :, None]
        r2_ = r_a[:, None, :]
        r1r2 = r1 * r2_
        if basis.torchani:
            cos_t = jnp.clip(0.95 * dot / r1r2, -0.95, 0.95)
            sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
        else:
            cos_t = dot / r1r2
            cross = jnp.cross(ang_delta[:, :, None, :], ang_delta[:, None, :, :])
            cross_sq = jnp.sum(cross * cross, axis=-1)
            cross_sq = jnp.where(tri_valid, cross_sq, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(cross_sq,
                                         jnp.asarray(1e-12, dtype))) / r1r2
    else:
        jj, kk = np.triu_indices(k_ang, k=1)
        sel_j = _selection_matrix(jj, k_ang, dtype)     # [T, K_ang]
        sel_k = _selection_matrix(kk, k_ang, dtype)
        d1 = jnp.einsum('tk,nkx->ntx', sel_j, ang_delta,
                        precision=jax.lax.Precision.HIGH)
        d2 = jnp.einsum('tk,nkx->ntx', sel_k, ang_delta,
                        precision=jax.lax.Precision.HIGH)
        r1 = jnp.einsum('tk,nk->nt', sel_j, r_a,
                        precision=jax.lax.Precision.HIGH)
        r2_ = jnp.einsum('tk,nk->nt', sel_k, r_a,
                        precision=jax.lax.Precision.HIGH)
        v1 = jnp.einsum('tk,nk->nt', sel_j, ang_valid.astype(dtype),
                        precision=jax.lax.Precision.HIGH)
        v2 = jnp.einsum('tk,nk->nt', sel_k, ang_valid.astype(dtype),
                        precision=jax.lax.Precision.HIGH)
        tri_valid = (v1 * v2) > 0.5
        oh1 = jnp.einsum('tk,nks->nts', sel_j, ang_oh,
                        precision=jax.lax.Precision.HIGH)
        oh2 = jnp.einsum('tk,nks->nts', sel_k, ang_oh,
                        precision=jax.lax.Precision.HIGH)

        dot = jnp.sum(d1 * d2, axis=-1)
        dot = jnp.where(tri_valid, dot, 0.0)
        r1r2 = r1 * r2_
        if basis.torchani:
            cos_t = jnp.clip(0.95 * dot / r1r2, -0.95, 0.95)
            sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
        else:
            cos_t = dot / r1r2
            cross = jnp.cross(d1, d2)
            cross_sq = jnp.sum(cross * cross, axis=-1)
            cross_sq = jnp.where(tri_valid, cross_sq, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(cross_sq, jnp.asarray(1e-12, dtype))) / r1r2

    r_mean = 0.5 * (r1 + r2_)
    fc2 = cosine_cutoff(r1, ra) * cosine_cutoff(r2_, ra)
    if basis.angular_rs_grid is not None:
        ts_grid = jnp.asarray(basis.angular_thetas_grid, dtype)
        rs_grid = jnp.asarray(basis.angular_rs_grid, dtype)
        zeta0 = basis.angular_zeta[0]
        eta0 = basis.angular_eta[0]
        cos_tm = (cos_t[..., None] * jnp.cos(ts_grid)
                  + sin_t[..., None] * jnp.sin(ts_grid))
        cos_pow = _pow(1.0 + cos_tm, zeta0)
        shifted_a = r_mean[..., None] - rs_grid
        exp_term = fc2[..., None] * jnp.exp(-eta0 * shifted_a * shifted_a)
        tri_term = exp_term[..., :, None] * cos_pow[..., None, :]
        a_len = len(basis.angular_rs_grid) * len(basis.angular_thetas_grid)
        tri_term = tri_term.reshape(*tri_term.shape[:-2], a_len)
    else:
        a_eta = jnp.asarray(basis.angular_eta, dtype)
        a_rs = jnp.asarray(basis.angular_rs, dtype)
        a_zeta = jnp.asarray(basis.angular_zeta, dtype)
        a_ts = jnp.asarray(basis.angular_thetas, dtype)
        cos_tm = cos_t[..., None] * jnp.cos(a_ts) + sin_t[..., None] * jnp.sin(a_ts)
        cos_term = _pow(1.0 + cos_tm, a_zeta)
        shifted_a = r_mean[..., None] - a_rs
        tri_term = fc2[..., None] * cos_term * jnp.exp(-a_eta * shifted_a * shifted_a)
    tri_term = jnp.where(tri_valid[..., None], tri_term, 0.0)

    # Contract over triples in the ORDERED species basis first — the [S, S*A]
    # output tile maps far better onto the MXU than the direct [P, A] one-hot
    # contraction (whose 28x32 tile wastes ~98% of the array) — then fold the
    # ordered matrix into the unordered pair index: for s1 < s2 the two
    # ordered entries sum; the diagonal passes through.
    a_len = tri_term.shape[-1]
    if angular_impl == 'dense':
        # Two successive K_ang-contractions (factorized pair one-hot):
        # X[n,j,u,a] = sum_k oh[n,k,u] tri[n,j,k,a];
        # ordered[n,s,u,a] = sum_j oh[n,j,s] X[n,j,u,a].
        oh_c = ang_oh.astype(cdt)
        x1 = jnp.einsum('nku,njka->njua', oh_c, tri_term.astype(cdt),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
        ordered = jnp.einsum('njs,njua->nsua', oh_c, x1.astype(cdt),
                             preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
        cols = []
        for s1 in range(s):
            for s2 in range(s1, s):
                if s1 == s2:
                    cols.append(ordered[:, s1, s1, :])
                else:
                    cols.append(ordered[:, s1, s2, :] + ordered[:, s2, s1, :])
        angular = jnp.stack(cols, axis=1)                  # [n, P, A]
    elif angular_impl == 'pair':
        # Direct unordered-pair one-hot contraction (narrow [P, A] tile).
        cols = []
        for s1 in range(s):
            for s2 in range(s1, s):
                if s1 == s2:
                    cols.append(oh1[..., s1] * oh2[..., s1])
                else:
                    cols.append(oh1[..., s1] * oh2[..., s2]
                                + oh1[..., s2] * oh2[..., s1])
        pair_oh = jnp.stack(cols, axis=-1) * tri_valid[..., None]
        angular = jnp.einsum('nta,ntp->npa', tri_term.astype(cdt),
                             pair_oh.astype(cdt),
                             preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
    else:
        if angular_impl == 'ordered2':
            # Materialize the (oh2 x tri) product explicitly, then one
            # 2-operand contraction — different VJP structure than the
            # 3-operand einsum (whose transpose XLA may schedule poorly).
            m2 = ((oh2 * tri_valid[..., None])[..., :, None]
                  * tri_term[..., None, :]).reshape(n, -1, s * a_len)
            ordered = jnp.einsum('nts,ntq->nsq', oh1.astype(cdt),
                                 m2.astype(cdt),
                                 preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
            ordered = ordered.reshape(n, s, s, a_len)
        else:
            ordered = jnp.einsum('nts,ntu,nta->nsua', oh1.astype(cdt),
                                 (oh2 * tri_valid[..., None]).astype(cdt),
                                 tri_term.astype(cdt),
                                 preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)
        cols = []
        for s1 in range(s):
            for s2 in range(s1, s):
                if s1 == s2:
                    cols.append(ordered[:, s1, s1, :])
                else:
                    cols.append(ordered[:, s1, s2, :] + ordered[:, s2, s1, :])
        angular = jnp.stack(cols, axis=1)                  # [n, P, A]
    a_zeta_full = jnp.asarray(basis.angular_zeta, dtype)
    angular = angular * _pow(2.0, 1.0 - a_zeta_full)

    return AEV(radial.reshape(n, -1), angular.reshape(n, -1))


def aev_forward(positions, species, basis: ANIBasis, box=None, neighbors=None,
                angular_capacity=None, centers=None) -> Array:
    """Concatenated [N, aev_length] feature matrix (radial || angular),
    the layout consumed by the atomic networks (SymmetryFunctions.py:120-122)."""
    radial, angular = compute_aev(positions, species, basis, box, neighbors,
                                  angular_capacity, centers)
    return jnp.concatenate([radial, angular], axis=1)
