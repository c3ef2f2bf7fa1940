"""AEV over species-blocked neighbor lists — static-segment reductions.

Same symmetry-function math as ``ops.aev`` (CpuANISymmetryFunctions.cpp:99-109,
:141-147, :183-190 — golden-tested), different data layout: the payload's
lanes are grouped by species with static per-species capacities
(``neighbors.blocked.BlockedLayout``), so

* the radial per-species scatter is a static slice-sum (no one-hot einsum);
* the angular triples enumerate species-pair blocks in species-pair-major
  order, so the per-species-pair scatter is a static slice-sum too;
* only species pairs PRESENT in the system are computed at all (a water box
  exercises 3 of ANI-2x's 28 pair channels; the other 25 are constant zero).

This is the XLA formulation of the fused Pallas kernel's data flow — the two
share layouts and are cross-checked in tests.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ANIBasis
from ..geometry import cosine_cutoff
from ..neighbors.blocked import BlockedLayout, BlockedPayload
from .aev import AEV, _pow, _selection_matrix, species_pair_index


class TripleTables(NamedTuple):
    """Static triple enumeration for a BlockedLayout (host-built, hashable
    by identity per layout)."""
    jj: np.ndarray            # [T] first-lane index into the angular list
    kk: np.ndarray            # [T] second-lane index
    seg_bounds: Tuple[int, ...]   # len n_pairs+1, segment t-ranges
    pair_ids: Tuple[int, ...]     # len n_pairs, unordered species-pair index


def build_triple_tables(layout: BlockedLayout) -> TripleTables:
    """Enumerate angular lane pairs species-pair-block by block.

    Within a species block: j < k (each unordered pair once). Across blocks
    (s_i < s_j in present order): the full cross product. Segments are
    contiguous in t, so the species-pair reduction is a static slice-sum.
    """
    table = species_pair_index(layout.num_species)
    offs = layout.ang_offsets
    jj, kk, bounds, pair_ids = [], [], [0], []
    for i, si in enumerate(layout.present):
        for j in range(i, len(layout.present)):
            sj = layout.present[j]
            oi, ki = offs[i], layout.ang_caps[i]
            oj, kj = offs[j], layout.ang_caps[j]
            if i == j:
                a, b = np.triu_indices(ki, k=1)
                jj.append(a + oi)
                kk.append(b + oi)
            else:
                a, b = np.meshgrid(np.arange(ki), np.arange(kj),
                                   indexing='ij')
                jj.append(a.reshape(-1) + oi)
                kk.append(b.reshape(-1) + oj)
            bounds.append(bounds[-1] + len(jj[-1]))
            pair_ids.append(int(table[si, sj]))
    return TripleTables(
        jj=np.concatenate(jj).astype(np.int32) if jj else np.zeros(0, np.int32),
        kk=np.concatenate(kk).astype(np.int32) if kk else np.zeros(0, np.int32),
        seg_bounds=tuple(bounds), pair_ids=tuple(pair_ids))


_TRIPLE_CACHE: dict = {}


def triple_tables(layout: BlockedLayout) -> TripleTables:
    key = (layout.num_species, layout.present, layout.ang_caps)
    if key not in _TRIPLE_CACHE:
        _TRIPLE_CACHE[key] = build_triple_tables(layout)
    return _TRIPLE_CACHE[key]


def compute_aev_blocked(payload: BlockedPayload, basis: ANIBasis,
                        layout: BlockedLayout,
                        chunk_size: Optional[int] = None,
                        angular_impl: str = 'xla') -> AEV:
    """Radial + angular AEV from a species-blocked payload.

    Output layout identical to :func:`ops.aev.compute_aev` (radial [N, S*R],
    angular [N, P*A] — the reference AEV layout, SymmetryFunctions.py:120-122).

    ``chunk_size``: process atoms in blocks under ``lax.map`` to bound the
    [chunk, T, A] angular intermediate at large N (XLA angular only — the
    Pallas kernel is internally blocked and needs no chunking).

    ``angular_impl``: 'xla' (static-segment einsum path) or 'pallas' (the
    fused VMEM kernel, ops/pallas_aev.py — requires a factored grid).
    """
    n = payload.rad_r.shape[0]
    if chunk_size is not None and n > chunk_size and angular_impl == 'xla':
        pad = (-n) % chunk_size
        nb = (n + pad) // chunk_size

        def body(chunk):
            return compute_aev_blocked(chunk, basis, layout)

        def split_rows(x):       # [N, ...] -> [nb, chunk, ...]
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            return x.reshape((nb, chunk_size) + x.shape[1:])

        def split_planes(x):     # [3, N, K] -> [nb, 3, chunk, K]
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((3, pad) + x.shape[2:], x.dtype)], axis=1)
            return x.reshape((3, nb, chunk_size) + x.shape[2:]).transpose(
                1, 0, 2, 3)

        zeros_nb = jnp.zeros((nb,), jnp.int32)
        out = jax.lax.map(body, BlockedPayload(
            split_planes(payload.rad_deltas), split_rows(payload.rad_r),
            split_rows(payload.rad_mask), split_planes(payload.ang_deltas),
            split_rows(payload.ang_r), split_rows(payload.ang_mask),
            zeros_nb, zeros_nb, zeros_nb))
        radial = out.radial.reshape(-1, out.radial.shape[-1])[:n]
        angular = out.angular.reshape(-1, out.angular.shape[-1])[:n]
        return AEV(radial, angular)

    dtype = payload.rad_deltas.dtype
    s = basis.num_species
    rc, ra = basis.radial_cutoff, basis.angular_cutoff

    # ---- Radial block: per-pair term, then static per-species slice sums.
    r_eta = jnp.asarray(basis.radial_eta, dtype)
    r_rs = jnp.asarray(basis.radial_rs, dtype)
    mask = payload.rad_mask & (payload.rad_r < rc)
    safe_r = jnp.where(mask, payload.rad_r, 1.0)
    fc = cosine_cutoff(safe_r, rc)
    shifted = safe_r[..., None] - r_rs
    radial_pair = fc[..., None] * jnp.exp(-r_eta * shifted * shifted)
    radial_pair = jnp.where(mask[..., None], radial_pair, 0.0)   # [N, Krt, R]
    num_r = basis.num_radial
    zero_col = jnp.zeros((n, num_r), dtype)
    cols = [zero_col] * s
    for i, sp in enumerate(layout.present):
        off = layout.rad_offsets[i]
        k = layout.rad_caps[i]
        cols[sp] = jnp.sum(radial_pair[:, off:off + k, :], axis=1)
    radial = jnp.stack(cols, axis=1)                             # [N, S, R]
    if basis.torchani:
        radial = radial * 0.25

    if angular_impl == 'pallas':
        from .pallas_aev import angular_aev_pallas
        if payload.ang_deltas is None:
            # Rad-only payload: the angular lanes are static slices of the
            # radial payload (angular-first lane order).
            angular = angular_aev_pallas(
                payload.rad_deltas, payload.ang_mask, basis, layout,
                rad_width=payload.rad_deltas.shape[2])
        else:
            angular = angular_aev_pallas(payload.ang_deltas,
                                         payload.ang_mask, basis, layout)
        return AEV(radial.reshape(n, -1), angular)

    # ---- Angular block: static species-pair-major triple enumeration.
    tables = triple_tables(layout)
    kat = layout.ang_total
    t = len(tables.jj)
    ang_mask = payload.ang_mask & (payload.ang_r < ra)
    ang_delta = jnp.where(ang_mask[None], payload.ang_deltas, 0.0)
    r_a = jnp.where(ang_mask, payload.ang_r, 1.0)

    sel_j = _selection_matrix(tables.jj, kat, dtype)             # [T, Kat]
    sel_k = _selection_matrix(tables.kk, kat, dtype)

    def expand(plane, sel):
        return jnp.einsum('tk,nk->nt', sel, plane,
                          precision=jax.lax.Precision.HIGH)

    # Plane-wise triple expansion: six dense [N, T] arrays instead of two
    # [N, T, 3] tensors (whose trailing length-3 axis lane-pads 42x).
    d1x, d1y, d1z = (expand(ang_delta[c], sel_j) for c in range(3))
    d2x, d2y, d2z = (expand(ang_delta[c], sel_k) for c in range(3))
    r1 = expand(r_a, sel_j)
    r2_ = expand(r_a, sel_k)
    v1 = expand(ang_mask.astype(dtype), sel_j)
    v2 = expand(ang_mask.astype(dtype), sel_k)
    tri_valid = (v1 * v2) > 0.5

    dot = d1x * d2x + d1y * d2y + d1z * d2z
    dot = jnp.where(tri_valid, dot, 0.0)
    r1r2 = r1 * r2_
    if basis.torchani:
        cos_t = jnp.clip(0.95 * dot / r1r2, -0.95, 0.95)
        sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
    else:
        cos_t = dot / r1r2
        cx = d1y * d2z - d1z * d2y
        cy = d1z * d2x - d1x * d2z
        cz = d1x * d2y - d1y * d2x
        cross_sq = cx * cx + cy * cy + cz * cz
        cross_sq = jnp.where(tri_valid, cross_sq, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(cross_sq,
                                     jnp.asarray(1e-12, dtype))) / r1r2

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
        a_len = len(rs_grid) * len(ts_grid)
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
        a_len = tri_term.shape[-1]
    tri_term = jnp.where(tri_valid[..., None], tri_term, 0.0)    # [N, T, A]

    num_pairs = basis.num_species_pairs
    zero_pair = jnp.zeros((n, a_len), dtype)
    pair_cols = [zero_pair] * num_pairs
    for seg, pid in enumerate(tables.pair_ids):
        t0, t1 = tables.seg_bounds[seg], tables.seg_bounds[seg + 1]
        if t1 > t0:
            pair_cols[pid] = pair_cols[pid] + jnp.sum(
                tri_term[:, t0:t1, :], axis=1)
    angular = jnp.stack(pair_cols, axis=1)                       # [N, P, A]
    a_zeta_full = jnp.asarray(basis.angular_zeta, dtype)
    angular = angular * _pow(2.0, 1.0 - a_zeta_full)

    return AEV(radial.reshape(n, -1), angular.reshape(n, -1))
