"""Particle Mesh Ewald electrostatics in pure JAX.

Reimplements the algorithm of the reference PME op (``src/pytorch/pme/``):

* direct space: erfc-damped Coulomb over a neighbor pair list with exclusion
  skipping, minus erf-damped compensation for the excluded interactions that
  reciprocal space unavoidably includes (pmeCPU.cpp:105-157);
* reciprocal space: cardinal B-spline charge spreading onto a 3D grid
  (pmeCPU.cpp:202-224), a real FFT, the Ewald k-space convolution and energy
  (pmeCPU.cpp:235-266), plus the analytic self-energy term (pme.py:194);
* host-side B-spline Fourier moduli precompute at construction (pme.py:94-129).

TPU-native differences:

* charge spreading is a single deterministic ``scatter-add`` of the
  [N, order^3] outer-product stencil (vs the reference's per-atom triple loop
  with atomicAdd, pmeCUDA.cu:158-190); the k-space factor is a broadcasted
  elementwise expression; the FFT is XLA's ``jnp.fft.rfftn``.
* gradients come from ``jax.grad`` through the whole thing — the spline
  recursion, the scatter (whose transpose is the force-interpolation gather of
  pmeCPU.cpp:324-343) and the FFT — so positions AND charges get exact
  derivatives of any order. The reference caches first derivatives in the
  forward pass and throws on second derivatives (pme.py:36-38); this
  implementation lifts that restriction.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erfc

from ..config import PMEConfig
from ..geometry import box_transform, invert_box, validate_box
from ..neighbors.pairs import MaskedPairs, neighbor_pairs_masked

Array = jnp.ndarray

_TWO_OVER_SQRT_PI = float(2.0 / np.sqrt(np.pi))


# ---------------------------------------------------------------------------
# B-spline machinery.

def bspline_weights(dr: Array, order: int) -> Array:
    """Cardinal B-spline weights of ``order`` for fractional offsets ``dr``.

    Returns [..., order] where slot k is the weight of grid point
    ``base + k``. Cox–de Boor recursion on uniform knots, vectorized over
    atoms/axes; same values as the reference's in-place ``computeSpline``
    recursion (pmeCPU.cpp:49-69). AD through the recursion reproduces the
    derivative splines (ddata) automatically.
    """
    pad = [(0, 0)] * dr.ndim
    w = jnp.stack([1.0 - dr, dr], axis=-1)
    for j in range(3, order + 1):
        div = 1.0 / (j - 1)
        prev = jnp.pad(w, pad + [(0, 1)])        # w_{j-1}[k]
        shifted = jnp.pad(w, pad + [(1, 0)])     # w_{j-1}[k-1]
        k = jnp.arange(j, dtype=dr.dtype)
        w = div * ((dr[..., None] + (j - 1 - k)) * shifted
                   + (k + 1.0 - dr[..., None]) * prev)
    return w


def bspline_moduli(grid_sizes: Sequence[int], order: int) -> Tuple[np.ndarray, ...]:
    """Squared DFT magnitudes of the B-spline for each grid axis.

    Host-side float64 precompute, one per axis, following the standard PME
    construction (Essmann et al. 1995; reference pme.py:94-129): evaluate the
    order-n spline at the integer knots, take |DFT|^2, and patch near-zero
    entries with the average of their neighbors.
    """
    # Order-n spline at integer nodes 1..n (dr = 0 stencil).
    data = np.zeros(order, dtype=np.float64)
    data[0] = 1.0
    for j in range(3, order + 1):
        div = 1.0 / (j - 1)
        new = np.zeros(order, dtype=np.float64)
        for k in range(j):
            left = data[k - 1] if k >= 1 else 0.0
            new[k] = div * ((j - 1 - k) * left + (k + 1.0) * data[k])
        data = new
    knots = np.zeros(max(grid_sizes), dtype=np.float64)
    knots[1:order + 1] = data[:order]

    moduli = []
    for ndata in grid_sizes:
        i = np.arange(ndata)
        arg = 2.0 * np.pi * np.outer(i, i) / ndata
        sc = (knots[:ndata] * np.cos(arg)).sum(axis=1)
        ss = (knots[:ndata] * np.sin(arg)).sum(axis=1)
        m = sc * sc + ss * ss
        small = m < 1e-7
        patched = 0.5 * (np.roll(m, 1) + np.roll(m, -1))
        m = np.where(small, patched, m)
        # Keep full f64 moduli: under jax_enable_x64 the reciprocal sum then
        # runs at double precision end-to-end (the reference computes pmeCPU
        # in double); without x64 jnp.asarray downcasts to f32 at use.
        moduli.append(m)
    return tuple(moduli)


# ---------------------------------------------------------------------------
# Direct space.

def pme_direct_energy(positions: Array, charges: Array, pairs: MaskedPairs,
                      exclusions: Array, alpha: float, coulomb: float) -> Array:
    """Direct-space Ewald energy over a masked pair list.

    Pairs listed in ``exclusions`` are skipped entirely; then every exclusion
    gets an erf-damped compensation subtracted using the UNWRAPPED
    displacement — excluded atoms still interact with all *other* periodic
    copies of each other (pme.py:25-33), and reciprocal space incorrectly
    added the primary-copy interaction, so exactly that one is removed
    (pmeCPU.cpp:134-157).

    exclusions: [N, E] int32 padded with -1.
    """
    q1 = charges[pairs.atom1]
    q2 = charges[pairs.atom2]
    # Exclusion lookup: pair (i, j) excluded iff j appears in exclusions[i].
    excl_rows = exclusions[pairs.atom1]                     # [P, E]
    excluded = jnp.any(excl_rows == pairs.atom2[:, None], axis=-1)
    include = pairs.mask & jnp.logical_not(excluded)

    r = jnp.where(include, pairs.distances, 1.0)
    alpha_r = alpha * r
    e_pair = coulomb * q1 * q2 * erfc(alpha_r) / r
    energy = jnp.sum(jnp.where(include, e_pair, 0.0))
    return energy - pme_exclusion_compensation(positions, charges,
                                               exclusions, alpha, coulomb)


def pme_exclusion_compensation(positions: Array, charges: Array,
                               exclusions: Array, alpha: float,
                               coulomb: float) -> Array:
    """The erf-damped energy of the excluded pairs (deduped to j > i),
    which reciprocal space incorrectly added and direct space must
    subtract — computed from the UNWRAPPED displacement (pme.py:25-33,
    pmeCPU.cpp:134-157)."""
    n, e = exclusions.shape
    if e == 0:
        return jnp.zeros((), positions.dtype)
    i_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, e))
    j_idx = exclusions
    valid = j_idx > i_idx                                # also rejects -1 padding
    j_safe = jnp.where(valid, j_idx, 0)
    dr = positions[i_idx.reshape(-1)] - positions[j_safe.reshape(-1)]
    d2 = jnp.sum(dr * dr, axis=-1).reshape(n, e)
    d2 = jnp.where(valid, d2, 1.0)
    rr = jnp.sqrt(d2)
    erf_term = 1.0 - erfc(alpha * rr)
    e_excl = coulomb * charges[i_idx] * charges[j_safe] * erf_term / rr
    return jnp.sum(jnp.where(valid, e_excl, 0.0))


# ---------------------------------------------------------------------------
# Reciprocal space.

_CHUNK = 8   # grid points per chunk axis for the chunked spreading path


def _chunkable(config: PMEConfig) -> bool:
    return (config.order <= _CHUNK + 1
            and all(g % _CHUNK == 0 and g >= 2 * _CHUNK
                    for g in config.grid_shape))


def _atom_chunk_data(positions: Array, charges: Array, box: Array,
                     config: PMEConfig):
    """Per-atom spline data + chunk assignment (shared by the chunked
    spread and its overflow check)."""
    gx, gy, gz = config.grid_shape
    order = config.order
    recip = invert_box(box)
    t = box_transform(positions, recip)
    t = (t - jnp.floor(t)) * jnp.asarray([gx, gy, gz], positions.dtype)
    ti = jnp.floor(t)
    dr = t - ti
    base = ti.astype(jnp.int32) % jnp.asarray([gx, gy, gz], jnp.int32)
    w = bspline_weights(dr, order)                          # [N, 3, order]
    chunk3 = base // _CHUNK
    lbase = base - chunk3 * _CHUNK                          # [N, 3] in [0, 8)
    ncy, ncz = gy // _CHUNK, gz // _CHUNK
    cid = (chunk3[:, 0] * ncy + chunk3[:, 1]) * ncz + chunk3[:, 2]
    return w, lbase, cid


def spread_capacity(num_atoms: int, config: PMEConfig) -> int:
    """Static per-chunk atom capacity for the chunked spreading path:
    4x the mean occupancy + 8 absorbs water-like density fluctuations
    (checked by ``spread_overflow`` under the usual soft-failure
    contract, getNeighborPairs.py:77-83)."""
    nchunks = int(np.prod([g // _CHUNK for g in config.grid_shape]))
    return int(np.ceil(4.0 * num_atoms / nchunks)) + 8


def spread_overflow(positions: Array, charges: Array, box: Array,
                    config: PMEConfig) -> Array:
    """TRUE max atoms-per-chunk of the chunked spreading path, as data —
    compare against ``spread_capacity`` between jitted calls; any excess
    means charge was silently dropped."""
    _, _, cid = _atom_chunk_data(positions, charges, box, config)
    nchunks = int(np.prod([g // _CHUNK for g in config.grid_shape]))
    counts = jax.ops.segment_sum(jnp.ones_like(cid), cid,
                                 num_segments=nchunks)
    return jnp.max(counts)


def spread_charges_chunked(positions: Array, charges: Array, box: Array,
                           config: PMEConfig,
                           capacity: Optional[int] = None) -> Array:
    """Scatter-free B-spline charge spreading (the TPU-native fast path).

    The reference spreads with per-atom triple loops + atomicAdd
    (pmeCUDA.cu:158-190); the direct XLA translation is an [N * order^3]
    scatter-add, which TPU lowers to a serialized ~ns-per-element update
    (measured 499.7 ms at 26k atoms / 128^3 grid, NOTES_PERF.md). This
    formulation has NO grid-sized scatter at all:

    * atoms are binned to 8^3-grid-point chunks by their stencil BASE cell;
      an order-n stencil (n <= 9) then lies entirely inside the chunk's
      [8 + n - 1 <= 16]^3 local grid — no halo atoms, each atom in exactly
      one chunk. Binning is one [N] sort + a fixed-capacity row scatter
      (whose autodiff transpose is a row gather);
    * per chunk, spreading is an outer product of one-hot spline matrices:
      local[x, yz] = WX^T[x, a] @ TYZ[a, yz] — an MXU matmul batched over
      chunks (grid-point values are SUMS over atoms; the matmul does the
      reduction that atomics did in the reference);
    * chunk-local grids are folded into the global grid by a static
      overlap-add: 2^3 reshape+roll terms (the spill of chunk c along an
      axis lands wholly in chunk c+1), all dense adds.

    Everything downstream of the binning permutation is dense math, so
    ``jax.grad`` yields the force-interpolation gather (pmeCPU.cpp:324-343)
    and second derivatives work. Atoms beyond ``capacity`` per chunk are
    dropped (soft failure; see ``spread_overflow``).
    """
    gx, gy, gz = config.grid_shape
    order = config.order
    ncx, ncy, ncz = gx // _CHUNK, gy // _CHUNK, gz // _CHUNK
    nchunks = ncx * ncy * ncz
    loc = _CHUNK + order - 1                  # local grid extent per axis
    n = positions.shape[0]
    cap = capacity if capacity is not None else spread_capacity(n, config)

    w, lbase, cid = _atom_chunk_data(positions, charges, box, config)
    amp = charges * np.sqrt(config.coulomb)

    # Fixed-capacity chunk slots: sort atoms by chunk, rank within chunk.
    cid_s = jax.lax.stop_gradient(cid)
    order_idx = jnp.argsort(cid_s, stable=True).astype(jnp.int32)
    sorted_cid = cid_s[order_idx]
    idx_n = jnp.arange(n, dtype=jnp.int32)
    new_seg = jnp.concatenate([jnp.ones((1,), bool),
                               sorted_cid[1:] != sorted_cid[:-1]])
    seg_start = jax.lax.cummax(jnp.where(new_seg, idx_n, 0))
    rank = idx_n - seg_start
    slot = jnp.where(rank < cap, sorted_cid * cap + rank, nchunks * cap)

    # Row scatter into slot space (AD transpose = row gather). Weights and
    # amplitude carry gradients; lbase is discrete (stop-gradient by cast).
    rows = jnp.concatenate([w.reshape(n, 3 * order),
                            amp[:, None]], axis=1)[order_idx]
    srows = jnp.zeros((nchunks * cap, 3 * order + 1), rows.dtype)
    srows = srows.at[slot].set(rows, mode='drop')
    slb = jnp.zeros((nchunks * cap, 3), jnp.int32)
    slb = slb.at[slot].set(lbase[order_idx], mode='drop')
    sw = srows[:, :3 * order].reshape(nchunks * cap, 3, order)
    samp = srows[:, 3 * order]

    # One-hot spline rows over the local grid (no wrap: lbase + k < loc).
    iota = jnp.arange(loc, dtype=jnp.int32)

    def onehot(axis):
        out = jnp.zeros((nchunks * cap, loc), positions.dtype)
        for k in range(order):
            hit = (slb[:, axis, None] + k) == iota[None, :]
            out = out + sw[:, axis, k:k + 1] * hit.astype(out.dtype)
        return out

    wxg = onehot(0).reshape(nchunks, cap, loc)
    wyg = onehot(1)
    wzg = onehot(2)
    tyz = (samp[:, None, None] * wyg[:, :, None]
           * wzg[:, None, :]).reshape(nchunks, cap, loc * loc)
    local = jnp.einsum('cax,cam->cxm', wxg, tyz,
                       preferred_element_type=positions.dtype,
                       precision=jax.lax.Precision.HIGHEST)
    local = local.reshape(ncx, ncy, ncz, loc, loc, loc)

    # Static overlap-add: per axis, local l in [0, 8) stays in chunk c,
    # l in [8, loc) spills wholly into chunk c+1 (order - 1 <= 8).
    spill = loc - _CHUNK

    def fold_axis(arr, caxis, laxis):
        main = jax.lax.slice_in_dim(arr, 0, _CHUNK, axis=laxis)
        sp = jax.lax.slice_in_dim(arr, _CHUNK, loc, axis=laxis)
        pad = [(0, 0)] * arr.ndim
        pad[laxis] = (0, _CHUNK - spill)
        sp = jnp.pad(sp, pad)
        sp = jnp.roll(sp, 1, axis=caxis)      # spill lands in chunk c+1
        return main + sp

    local = fold_axis(local, 0, 3)
    local = fold_axis(local, 1, 4)
    local = fold_axis(local, 2, 5)
    grid = local.transpose(0, 3, 1, 4, 2, 5).reshape(gx, gy, gz)
    return grid


def spread_charges(positions: Array, charges: Array, box: Array,
                   config: PMEConfig) -> Array:
    """Spread charges onto the PME grid with order-n B-splines.

    Dispatches to the scatter-free chunked formulation
    (``spread_charges_chunked``) whenever the grid allows it; otherwise one
    scatter-add of the [N, order^3] stencil (deterministic on TPU),
    replacing the reference's per-atom loops + atomics (pmeCPU.cpp:202-224).
    Differentiating through either yields the force-interpolation
    gather automatically.
    """
    if _chunkable(config):
        return spread_charges_chunked(positions, charges, box, config)
    gx, gy, gz = config.grid_shape
    order = config.order
    recip = invert_box(box)
    t = box_transform(positions, recip)                                   # fractional coords
    t = (t - jnp.floor(t)) * jnp.asarray([gx, gy, gz], positions.dtype)
    ti = jnp.floor(t)
    dr = t - ti                                             # in [0, 1)
    base = ti.astype(jnp.int32) % jnp.asarray([gx, gy, gz], jnp.int32)

    w = bspline_weights(dr, order)                          # [N, 3, order]
    offsets = jnp.arange(order, dtype=jnp.int32)
    idx = (base[:, :, None] + offsets) % jnp.asarray([gx, gy, gz], jnp.int32)[None, :, None]

    amp = charges * np.sqrt(config.coulomb)
    stencil = (amp[:, None, None, None]
               * w[:, 0, :, None, None] * w[:, 1, None, :, None] * w[:, 2, None, None, :])
    flat_idx = ((idx[:, 0, :, None, None] * gy + idx[:, 1, None, :, None]) * gz
                + idx[:, 2, None, None, :])
    grid = jnp.zeros((gx * gy * gz,), positions.dtype)
    grid = grid.at[flat_idx.reshape(-1)].add(stencil.reshape(-1))
    return grid.reshape(gx, gy, gz)


def reciprocal_eterm(box: Array, config: PMEConfig,
                     moduli: Tuple[Array, Array, Array]) -> Array:
    """The k-space convolution factor over the rfftn half-spectrum
    (pmeCPU.cpp:243-260), as one broadcasted expression."""
    gx, gy, gz = config.grid_shape
    zsize = gz // 2 + 1
    recip = invert_box(box)

    def wrapped(k, g):
        return jnp.where(k < (g + 1) // 2, k, k - g).astype(box.dtype)

    mx = wrapped(jnp.arange(gx), gx)[:, None, None]
    my = wrapped(jnp.arange(gy), gy)[None, :, None]
    mz = wrapped(jnp.arange(zsize), gz)[None, None, :]
    mhx = mx * recip[0, 0]
    mhy = mx * recip[1, 0] + my * recip[1, 1]
    mhz = mx * recip[2, 0] + my * recip[2, 1] + mz * recip[2, 2]
    m2 = mhx * mhx + mhy * mhy + mhz * mhz

    scale_factor = jnp.pi * box[0, 0] * box[1, 1] * box[2, 2]
    # Match the working dtype (moduli are stored f64; see bspline_moduli).
    mod = tuple(m.astype(box.dtype) for m in moduli)
    denom = m2 * scale_factor * (mod[0][:, None, None]
                                 * mod[1][None, :, None]
                                 * mod[2][None, None, :zsize])
    exp_factor = (jnp.pi * jnp.pi) / (config.alpha * config.alpha)
    safe_m2 = jnp.where(m2 > 0, m2, 1.0)
    safe_denom = jnp.where(denom != 0, denom, 1.0)
    eterm = jnp.exp(-exp_factor * safe_m2) / safe_denom
    # Zero the k=0 term (index 0 in the flat ordering, pmeCPU.cpp:259).
    eterm = eterm.at[0, 0, 0].set(0.0)
    return eterm


def pme_reciprocal_energy(positions: Array, charges: Array, box: Array,
                          config: PMEConfig,
                          moduli: Tuple[Array, Array, Array]) -> Array:
    """Reciprocal-space Ewald energy, NOT including the self-energy term."""
    gx, gy, gz = config.grid_shape
    zsize = gz // 2 + 1
    grid = spread_charges(positions, charges, box, config)
    gk = jnp.fft.rfftn(grid)
    eterm = reciprocal_eterm(box, config, moduli)
    # Half-spectrum double-count factor (pmeCPU.cpp:260): interior kz planes
    # represent two conjugate frequencies.
    kz = jnp.arange(zsize)
    scale = jnp.where((kz > 0) & (kz <= (gz - 1) // 2), 2.0, 1.0)[None, None, :]
    power = gk.real * gk.real + gk.imag * gk.imag
    return 0.5 * jnp.sum(scale * eterm * power)


def pme_self_energy(charges: Array, alpha: float, coulomb: float) -> Array:
    """The analytic Ewald self-energy ``-sum(q^2) * k * alpha / sqrt(pi)``
    (pme.py:194)."""
    return -jnp.sum(charges * charges) * coulomb * alpha / np.sqrt(np.pi)


# ---------------------------------------------------------------------------
# User-facing class (API parity with NNPOps.pme.PME).

class PME:
    """Particle Mesh Ewald, mirroring the reference class (pme/pme.py:52-196).

    Unlike the reference this is stateless after construction and every
    method is jit-able and differentiable to arbitrary order w.r.t. both
    positions and charges.
    """

    def __init__(self, gridx: int, gridy: int, gridz: int, order: int,
                 alpha: float, coulomb: float, exclusions):
        self.config = PMEConfig(gridx, gridy, gridz, order, alpha, coulomb)
        exclusions = np.asarray(exclusions, dtype=np.int32)
        if exclusions.ndim != 2:
            raise ValueError('exclusions must be 2D')
        self.exclusions = jnp.asarray(exclusions)
        self.moduli = tuple(jnp.asarray(m) for m in
                            bspline_moduli(self.config.grid_shape, order))

    def _check(self, positions, charges):
        if positions.ndim != 2 or positions.shape[1] != 3:
            raise ValueError('positions must have shape (atoms, 3)')
        if charges.ndim != 1:
            raise ValueError('charges must be 1D')
        if (positions.shape[0] != self.exclusions.shape[0]
                or charges.shape[0] != self.exclusions.shape[0]):
            raise ValueError('positions, charges, and exclusions must all have the same length')

    def compute_direct(self, positions: Array, charges: Array, cutoff: float,
                       box_vectors: Array, max_num_pairs: int = -1,
                       cell_list=None) -> Array:
        """Direct-space energy (pme.py:131-165). Builds the neighbor list
        internally, like the reference.

        ``cell_list``: optional ``CellList`` — use the O(N) cell-list
        neighbor construction instead of the O(N^2) triangular enumeration
        (3.4e8 candidate pairs at 26k atoms). The cell list must have been
        created with a cutoff >= ``cutoff``; pairs are re-masked to the PME
        cutoff here. Overflow stays observable via the payload counts
        (build it separately to check) — same soft-failure contract.
        """
        self._check(positions, charges)
        if cutoff <= 0:
            raise ValueError('cutoff must be positive')
        if not isinstance(box_vectors, jax.core.Tracer):
            validate_box(box_vectors, cutoff)
        if cell_list is not None:
            if cell_list.cutoff < cutoff:
                raise ValueError(
                    f'cell_list cutoff {cell_list.cutoff} < PME cutoff {cutoff}')
            from ..neighbors.cell_list import payload_to_half_pairs
            payload = cell_list.build_payload(positions, box_vectors)
            pairs = payload_to_half_pairs(payload, cutoff)
        else:
            pairs = neighbor_pairs_masked(positions, cutoff, max_num_pairs,
                                          box_vectors)
        return pme_direct_energy(positions, charges, pairs, self.exclusions,
                                 self.config.alpha, self.config.coulomb)

    def plan_direct_window(self, box_vectors, cutoff: float, positions,
                           margin: float = 1.25, bucket: bool = False):
        """Host-side plan (cell grid, capacity) for the window direct-space
        kernel, sized from the true cell occupancy of ``positions`` times
        ``margin``; None when the box is under 3 cells of ``cutoff``.
        ``bucket=True`` additionally plans cell-occupancy bucketing
        (4-tuple plan; see ``pallas_pme.plan_pme_window``)."""
        from .pallas_pme import plan_pme_window
        return plan_pme_window(np.asarray(box_vectors), cutoff, positions,
                               margin=margin, bucket=bucket)

    def compute_direct_window(self, positions: Array, charges: Array,
                              cutoff: float, box_vectors: Array,
                              window_plan) -> Array:
        """Direct-space energy via the dense per-cell window Pallas kernel
        (``ops.pallas_pme``) — no pair list, no per-pair gathers; the
        O(N)-scalable production path (the flat-pair route was measured at
        438 ms for 26k atoms, the window kernel replaces it wholesale).

        ``window_plan``: the (cell_grid, capacity) pair from
        ``plan_direct_window`` (host-side, once per box size). Overflow of
        the per-cell capacity is observable via
        ``direct_window_overflow`` — the usual soft-failure contract
        (getNeighborPairs.py:77-83).
        """
        from .pallas_pme import pme_direct_window
        self._check(positions, charges)
        if cutoff <= 0:
            raise ValueError('cutoff must be positive')
        if not isinstance(box_vectors, jax.core.Tracer):
            validate_box(box_vectors, cutoff)
        ncells3, capacity, *buck = window_plan
        small_cap, num_big = buck if buck else (None, None)
        energy, _ = pme_direct_window(
            positions, charges, box_vectors, self.exclusions, cutoff,
            self.config.alpha, self.config.coulomb, ncells3, capacity,
            small_cap=small_cap, num_big=num_big)
        return energy - pme_exclusion_compensation(
            positions, charges, self.exclusions, self.config.alpha,
            self.config.coulomb)

    def direct_window_overflow(self, positions: Array, box_vectors: Array,
                               window_plan) -> Array:
        """TRUE max per-cell occupancy of the window direct path, as data —
        compare against ``window_plan[1]`` between jitted calls. For a
        bucketed 4-tuple plan the big-cell-COUNT overflow (more cells
        above small_cap than planned) is folded in as a value above the
        capacity, so the same ``> capacity`` check covers both limits."""
        from .pallas_pme import pme_window_count_overflow, \
            pme_window_occupancy
        occ = pme_window_occupancy(positions, box_vectors, window_plan[0])
        if len(window_plan) >= 4 and window_plan[2] is not None:
            occ = jnp.maximum(occ, pme_window_count_overflow(
                positions, box_vectors, window_plan))
        return occ

    def compute_reciprocal(self, positions: Array, charges: Array,
                           box_vectors: Array) -> Array:
        """Reciprocal-space energy including the self-energy term
        (pme.py:167-196)."""
        self._check(positions, charges)
        return (pme_self_energy(charges, self.config.alpha, self.config.coulomb)
                + pme_reciprocal_energy(positions, charges, box_vectors,
                                        self.config, self.moduli))
