"""Dense per-cell window kernel for PME direct space — Pallas TPU.

The reference computes direct-space Ewald over a neighbor pair list
(pmeCPU.cpp:105-157, pmeCUDA.cu:30-95, list built by getNeighborPairs).
The straightforward TPU translation (cell-list pair list + erfc over flat
pairs) is dominated by per-pair row gathers, their scatter-add adjoints,
and the per-call [N, 27c] compaction sort — measured 438 ms of a 454 ms
26k-atom PME evaluation (NOTES_PERF round-2 session 6).

This kernel removes the pair list entirely, mirroring the window-radial
AEV design (``pallas_window``): the direct-space energy of every atom in
a cell is an erfc-damped sum over the cell's dense 27-cell candidate
window (``kk = 27 * c`` slots, built by coarse cell-granularity copies).
Per grid step everything is a [c, kk] VMEM array; each DIRECTED pair is
computed once per center, so the total carries a factor 1/2.

erfc is evaluated in-kernel with the Abramowitz & Stegun 7.1.26 rational
approximation (|eps| <= 1.5e-7 absolute, exactly the f32 noise floor) —
one exp plus a degree-5 polynomial per pair slot, portable across Pallas
backends.

Exclusions (pme.py:25-33: listed pairs skip the erfc sum entirely; the
separately-computed erf compensation stays in ``ops.pme``) are handled
in-kernel: each center row carries its partners' SLOT ids and every lane
compares its own global slot id — reconstructed from iota arithmetic and
the grid position, no materialized id window — against them.

Differentiable in positions AND charges via a recompute-strategy custom
VJP (the reference's CUDA backprop strategy); second derivatives follow
from the VJP being built from jnp primitives... (the VJP kernel itself is
first-order; the surrounding class falls back to the pair path when
higher derivatives are requested).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_window import FAR

Array = jnp.ndarray

# Abramowitz & Stegun 7.1.26 erfc coefficients.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erfc_poly(x):
    """erfc(x) for x >= 0 (A&S 7.1.26, |eps| <= 1.5e-7)."""
    t = 1.0 / (1.0 + _AS_P * x)
    poly = _AS_A[4]
    for a in (_AS_A[3], _AS_A[2], _AS_A[1], _AS_A[0]):
        poly = poly * t + a
    return poly * t * jnp.exp(-x * x)


def make_pme_window_kernel(cutoff: float, alpha: float, coulomb: float,
                           ncells3: Tuple[int, int, int], capacity: int,
                           num_excl: int,
                           interpret: Optional[bool] = None,
                           center_rows: Optional[int] = None,
                           use_cellmap: bool = False):
    """Build the fused window direct-space function for one configuration.

    Returns ``fn(candx, candy, candz, candq, centers, excl) ->
    [ncells, c, 1]`` per-slot energies (sum = direct energy), where

    * ``candx/y/z/q``: [ncells, kk] candidate coordinate/charge planes
      (entry-major window order, periodic image shifts applied, empty
      slots at FAR with charge 0),
    * ``centers``: [ncells, c, 4] the cells' own slot positions+charges,
    * ``excl``: [ncells, c, E] global slot ids to skip (E = num_excl;
      pass a [ncells, c, 1] array of -1 when E = 0).

    Differentiable in (candx, candy, candz, candq, centers).

    ``center_rows``: center-row count per cell <= capacity (cell-occupancy
    bucketing: low-occupancy cells pass packed [*, center_rows, 4] centers
    against the full-capacity candidate window — rows are slot ranks, so
    the self-lane identity is unchanged). ``use_cellmap``: the returned fn
    takes a trailing int32 [ncells_call] TRUE-cell-id map (scalar-prefetch)
    instead of assuming grid position == cell id — required whenever the
    caller permutes cells (bucketing sorts big cells first), since the
    lane slot ids / self-exclusion derive the stencil from the cell id.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    rc = float(cutoff)
    al = float(alpha)
    ke = float(coulomb)
    nx, ny, nz = (int(v) for v in ncells3)
    ncells = nx * ny * nz
    c = int(capacity)
    cr = int(center_rows) if center_rows else c
    kk = 27 * c
    ne = max(int(num_excl), 1)
    has_excl = num_excl > 0
    two_over_sqrt_pi = 2.0 / math.sqrt(math.pi)

    # Row blocking: the backward kernel keeps ~14 [rb, kk] f32 temporaries
    # live at once; scoped VMEM is 16 MB, so bound rb (measured OOM at
    # [200, 5400] on v5e). Round 5: rb no longer has to divide c — center
    # rows are PADDED to a multiple of rb instead. The old divisor rule
    # collapsed rb to 8 at production shapes (c=104 -> rb=8: single-sublane
    # [8, kk] tiles, the narrow-array instruction-overhead wall that cost
    # the z-pair/cluster kernels 2x, NOTES_PERF r2 session 6); rb=32+ rides
    # 4-sublane tiles. The row loop is a grid dimension (pipelined DMA),
    # not a fori_loop.
    def _pick_rb(n_arrays: int) -> int:
        # ~8 MB of the ~16 MB scoped VMEM for the live [rb, kk] f32 set
        # (6 MB measured safe in round 2 at rb=8; the 2D-grid restructure
        # keeps the same array census, so 8 MB still leaves the lane
        # inputs + dctr block + pipelining headroom).
        budget = int(8e6 // (kk * 4 * n_arrays)) // 8 * 8
        hi = int(max(8, min(64, budget, -(-cr // 8) * 8)))
        # Among 8-multiples that fit VMEM, keep blocks at >= 4 sublane
        # tiles when the budget allows (narrow tiles are the instruction
        # wall), then minimize padded-row waste (ceil(cr/rb)*rb),
        # tie-broken toward wider blocks.
        cands = range(min(32, hi), hi + 1, 8)
        return min(cands, key=lambda r: (-(-cr // r) * r, -r))

    rb_f = _pick_rb(7)
    rb_b = _pick_rb(14)
    cpad_f = -(-cr // rb_f) * rb_f
    cpad_b = -(-cr // rb_b) * rb_b

    def lane_slot_ids(a):
        """[1, kk] global slot id of every window lane of cell ``a``
        (iota arithmetic; offsets enumerate (-1,0,1)^3 entry-major, the
        _window_tables convention)."""
        az = a % nz
        axy = a // nz
        ay = axy % ny
        ax = axy // ny
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, kk), 1)
        entry = lane // c
        rank = lane % c
        ox = entry // 9 - 1
        oy = (entry // 3) % 3 - 1
        oz = entry % 3 - 1
        bx = (ax + ox + nx) % nx
        by = (ay + oy + ny) % ny
        bz = (az + oz + nz) % nz
        return ((bx * ny + by) * nz + bz) * c + rank

    def pair_quantities(cx, cy, cz, ctr, a, row0, rb):
        """Quantities for center rows [row0, row0 + rb) of cell ``a``;
        everything is [rb, kk]. Padded center rows (row >= c, FAR fill)
        fail the cutoff on their own."""
        dx = cx - ctr[:, 0:1]
        dy = cy - ctr[:, 1:2]
        dz = cz - ctr[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        slot_ids = lane_slot_ids(a)                       # [1, kk]
        row = jax.lax.broadcasted_iota(jnp.int32, (rb, kk), 0) + row0
        self_slot = a * c + row
        valid = (d2 < rc * rc) & (slot_ids != self_slot)
        r = jnp.sqrt(jnp.maximum(d2, 1e-12))
        return dx, dy, dz, r, valid, slot_ids

    def excl_mask(excl, slot_ids, rb):
        if not has_excl:
            return None
        m = jnp.zeros((rb, kk), jnp.bool_)
        for e in range(num_excl):
            m = m | (excl[:, e:e + 1] == slot_ids)
        return m

    def fwd_kernel(*refs):
        if use_cellmap:
            cid_ref, refs = refs[0], refs[1:]
            a = cid_ref[pl.program_id(0)]
        else:
            a = pl.program_id(0)
        (cx_ref, cy_ref, cz_ref, cq_ref, ctr_ref, excl_ref,
         out_ref) = refs
        j = pl.program_id(1)
        cx = cx_ref[0]
        cy = cy_ref[0]
        cz = cz_ref[0]
        cq = cq_ref[0]                                    # [1, kk]
        ctr = ctr_ref[0]                                  # [rb_f, 4]
        _, _, _, r, valid, slot_ids = pair_quantities(cx, cy, cz, ctr, a,
                                                      j * rb_f, rb_f)
        if has_excl:
            valid = valid & ~excl_mask(excl_ref[0], slot_ids, rb_f)
        w = jnp.where(valid, _erfc_poly(al * r) / r, 0.0)
        qq = ctr[:, 3:4] * cq                             # [rb_f, kk]
        out_ref[0] = (0.5 * ke) * jnp.sum(qq * w, axis=1, keepdims=True)

    def bwd_kernel(*refs):
        if use_cellmap:
            cid_ref, refs = refs[0], refs[1:]
            a = cid_ref[pl.program_id(0)]
        else:
            a = pl.program_id(0)
        (cx_ref, cy_ref, cz_ref, cq_ref, ctr_ref, excl_ref,
         g_ref, dcx_ref, dcy_ref, dcz_ref, dcq_ref, dctr_ref) = refs
        j = pl.program_id(1)
        cx = cx_ref[0]
        cy = cy_ref[0]
        cz = cz_ref[0]
        cq = cq_ref[0]
        ctr = ctr_ref[0]                                  # [rb_b, 4]
        gg = g_ref[0]                                     # [rb_b, 1]
        dx, dy, dz, r, valid, slot_ids = pair_quantities(cx, cy, cz, ctr,
                                                         a, j * rb_b, rb_b)
        if has_excl:
            valid = valid & ~excl_mask(excl_ref[0], slot_ids, rb_b)
        rinv = 1.0 / r
        erfc_r = _erfc_poly(al * r)
        w = jnp.where(valid, erfc_r * rinv, 0.0)
        # d/dr [erfc(al r)/r] = -(2al/sqrt(pi) e^{-a^2r^2} + erfc/r)/r
        dw = jnp.where(
            valid,
            -(two_over_sqrt_pi * al * jnp.exp(-(al * r) ** 2)
              + erfc_r * rinv) * rinv, 0.0)
        qq = ctr[:, 3:4] * cq
        ghalf = (0.5 * ke) * gg                           # [rb_b, 1]
        coef = ghalf * qq * dw * rinv                     # [rb_b, kk]
        gx = coef * dx
        gy = coef * dy
        gz = coef * dz
        # delta = cand - center: +coef*d to the lane, -coef*d to row. The
        # lane cotangents accumulate across the row-block grid steps of one
        # cell (the dc* blocks revisit: their index_map ignores j).
        sx = jnp.sum(gx, axis=0, keepdims=True)
        sy = jnp.sum(gy, axis=0, keepdims=True)
        sz = jnp.sum(gz, axis=0, keepdims=True)
        gw = ghalf * w
        sq = jnp.sum(gw * ctr[:, 3:4], axis=0, keepdims=True)

        @pl.when(j == 0)
        def _init():
            dcx_ref[0] = sx
            dcy_ref[0] = sy
            dcz_ref[0] = sz
            dcq_ref[0] = sq

        @pl.when(j > 0)
        def _acc():
            dcx_ref[0] += sx
            dcy_ref[0] += sy
            dcz_ref[0] += sz
            dcq_ref[0] += sq

        dq_row = jnp.sum(gw * cq, axis=1, keepdims=True)
        dctr_ref[0] = jnp.concatenate(
            [-jnp.sum(gx, axis=1, keepdims=True),
             -jnp.sum(gy, axis=1, keepdims=True),
             -jnp.sum(gz, axis=1, keepdims=True),
             dq_row], axis=1)

    def lane_spec():
        # *_ tolerates the scalar-prefetch ref PrefetchScalarGridSpec
        # appends to index_map arguments (use_cellmap mode).
        return pl.BlockSpec((1, 1, kk), lambda i, j, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def row_spec(rows, width):
        return pl.BlockSpec((1, rows, width), lambda i, j, *_: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def _mid(x):
        return x.reshape(x.shape[0], 1, x.shape[1])

    def _pad_rows(x, cpad, fill):
        if cpad == x.shape[1]:
            return x
        return jnp.concatenate(
            [x, jnp.full((x.shape[0], cpad - x.shape[1]) + x.shape[2:],
                         fill, x.dtype)], axis=1)

    def _call(kernel, nc_call, rb, in_specs, out_specs, out_shape, args,
              cellmap):
        if use_cellmap:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(nc_call, -(-cr // rb)),
                in_specs=in_specs, out_specs=out_specs)
            return pl.pallas_call(kernel, grid_spec=grid_spec,
                                  out_shape=out_shape,
                                  interpret=interpret)(
                cellmap.astype(jnp.int32), *args)
        return pl.pallas_call(kernel, grid=(nc_call, -(-cr // rb)),
                              in_specs=in_specs, out_specs=out_specs,
                              out_shape=out_shape,
                              interpret=interpret)(*args)

    def run_fwd(candx, candy, candz, candq, centers, excl, cellmap):
        nc_call = candx.shape[0]
        out = _call(
            fwd_kernel, nc_call, rb_f,
            [lane_spec()] * 4 + [row_spec(rb_f, 4), row_spec(rb_f, ne)],
            row_spec(rb_f, 1),
            jax.ShapeDtypeStruct((nc_call, cpad_f, 1), jnp.float32),
            (_mid(candx), _mid(candy), _mid(candz), _mid(candq),
             _pad_rows(centers, cpad_f, 2.0 * FAR),
             _pad_rows(excl, cpad_f, -1)), cellmap)
        return out[:, :cr]

    def run_bwd(candx, candy, candz, candq, centers, excl, cellmap, g):
        nc_call = candx.shape[0]
        outs = _call(
            bwd_kernel, nc_call, rb_b,
            [lane_spec()] * 4 + [row_spec(rb_b, 4), row_spec(rb_b, ne),
                                 row_spec(rb_b, 1)],
            (lane_spec(),) * 4 + (row_spec(rb_b, 4),),
            (jax.ShapeDtypeStruct((nc_call, 1, kk), jnp.float32),
             jax.ShapeDtypeStruct((nc_call, 1, kk), jnp.float32),
             jax.ShapeDtypeStruct((nc_call, 1, kk), jnp.float32),
             jax.ShapeDtypeStruct((nc_call, 1, kk), jnp.float32),
             jax.ShapeDtypeStruct((nc_call, cpad_b, 4), jnp.float32)),
            (_mid(candx), _mid(candy), _mid(candz), _mid(candq),
             _pad_rows(centers, cpad_b, 2.0 * FAR),
             _pad_rows(excl, cpad_b, -1), _pad_rows(g, cpad_b, 0.0)),
            cellmap)
        dcx, dcy, dcz, dcq, dctr = outs
        return (dcx.reshape(nc_call, kk), dcy.reshape(nc_call, kk),
                dcz.reshape(nc_call, kk), dcq.reshape(nc_call, kk),
                dctr[:, :cr])

    if use_cellmap:
        @jax.custom_vjp
        def pme_window(candx, candy, candz, candq, centers, excl,
                       cellmap):
            return run_fwd(candx, candy, candz, candq, centers, excl,
                           cellmap)

        def _fwd(candx, candy, candz, candq, centers, excl, cellmap):
            return (run_fwd(candx, candy, candz, candq, centers, excl,
                            cellmap),
                    (candx, candy, candz, candq, centers, excl, cellmap))

        def _bwd(res, g):
            candx, candy, candz, candq, centers, excl, cellmap = res
            dcx, dcy, dcz, dcq, dctr = run_bwd(
                candx, candy, candz, candq, centers, excl, cellmap,
                g.astype(jnp.float32))
            return dcx, dcy, dcz, dcq, dctr, None, None
    else:
        @jax.custom_vjp
        def pme_window(candx, candy, candz, candq, centers, excl):
            return run_fwd(candx, candy, candz, candq, centers, excl,
                           None)

        def _fwd(candx, candy, candz, candq, centers, excl):
            return (run_fwd(candx, candy, candz, candq, centers, excl,
                            None),
                    (candx, candy, candz, candq, centers, excl))

        def _bwd(res, g):
            candx, candy, candz, candq, centers, excl = res
            dcx, dcy, dcz, dcq, dctr = run_bwd(
                candx, candy, candz, candq, centers, excl, None,
                g.astype(jnp.float32))
            return dcx, dcy, dcz, dcq, dctr, None

    pme_window.defvjp(_fwd, _bwd)
    return pme_window


_KERNEL_CACHE: dict = {}


def pme_direct_window(positions: Array, charges: Array, box: Array,
                      exclusions: Array, cutoff: float, alpha: float,
                      coulomb: float, ncells3: Tuple[int, int, int],
                      capacity: int,
                      interpret: Optional[bool] = None,
                      small_cap: Optional[int] = None,
                      num_big: Optional[int] = None):
    """Direct-space Ewald energy via the dense per-cell window kernel.

    ``ncells3``/``capacity``: cell grid (>= 3 per axis, cell width >=
    cutoff) and per-cell slot capacity. Returns (energy, max_occupancy) —
    the occupancy is the usual soft-failure count (compare against
    ``capacity`` between jitted calls; getNeighborPairs.py:77-83).
    Differentiable in positions, charges, and box.

    ``small_cap``/``num_big`` (cell-occupancy bucketing, the radial-AEV
    kernel's trick): cells with occupancy > small_cap sort to the front
    and run at full capacity rows; the rest run with centers packed to
    ``small_cap`` rows — mean occupancy sits well under the Poisson-safe
    capacity, so the small class drops most of the center-row padding.
    If MORE than ``num_big`` cells are big at runtime the overflowing
    cells lose center rows; that state is folded into the returned
    occupancy as a sentinel (2^30), so existing ``> capacity`` checks
    fire — the standard soft-failure contract.
    """
    from ..geometry import box_transform
    from ..neighbors.window import _make_stencil_window, _window_tables
    nx, ny, nz = (int(v) for v in ncells3)
    ncells = nx * ny * nz
    c = int(capacity)
    cc = ncells * c
    n = positions.shape[0]
    num_excl = int(exclusions.shape[1])

    # Cell sort (stop-gradient; the wrap shift is differentiable-neutral
    # because the energy uses relative displacements only).
    pos_s = jax.lax.stop_gradient(positions)
    box_s = jax.lax.stop_gradient(box)
    inv = jnp.linalg.inv(box_s)
    frac = box_transform(pos_s, inv)
    wrap_shift = box_transform(jnp.floor(frac), box_s)
    frac = frac - jnp.floor(frac)
    ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
    cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0,
                     ncells_arr - 1)
    cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]
    order = jnp.argsort(cell_id, stable=True).astype(jnp.int32)
    sorted_id = cell_id[order]
    idx_n = jnp.arange(n, dtype=jnp.int32)
    new_seg = jnp.concatenate([jnp.ones((1,), bool),
                               sorted_id[1:] != sorted_id[:-1]])
    seg_start = jax.lax.cummax(jnp.where(new_seg, idx_n, 0))
    rank = idx_n - seg_start
    slot = jnp.where(rank < c, sorted_id * c + rank, cc + 1)
    occupancy = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), cell_id,
                                    num_segments=ncells)
    max_occ = jnp.max(occupancy)

    p_w = positions - wrap_shift
    rows = jnp.concatenate([p_w[order], charges[order, None]], axis=1)
    slots = jnp.full((cc, 4), FAR, positions.dtype)
    slots = slots.at[:, 3].set(0.0)
    slots = slots.at[slot].set(rows, mode='drop')
    centers = slots.reshape(ncells, c, 4)

    # Exclusion slot table (frozen per call): atom -> slot, then per-row
    # partner slots scattered into slot space.
    if num_excl > 0:
        slot_of_atom = jnp.full((n,), cc + 1, jnp.int32).at[order].set(
            slot.astype(jnp.int32), mode='drop')
        epad = jnp.concatenate([slot_of_atom, jnp.asarray([-1], jnp.int32)])
        excl_slots = epad[jnp.where(exclusions >= 0, exclusions, n)]
        excl_table = jnp.full((cc, num_excl), -1, jnp.int32)
        excl_table = excl_table.at[slot_of_atom].set(excl_slots,
                                                     mode='drop')
        excl_table = excl_table.reshape(ncells, c, num_excl)
    else:
        excl_table = jnp.full((ncells, c, 1), -1, jnp.int32)

    f27_np, _, _ = _window_tables((nx, ny, nz))
    shift27 = box_transform(jnp.asarray(f27_np), box)     # [ncells, 27, 3]
    shift_planes = jnp.repeat(shift27.transpose(2, 0, 1), c, axis=2)
    planes = slots.T.reshape(4, ncells, c)
    win = _make_stencil_window((nx, ny, nz), c)(planes)   # [4, cells, kk]
    candx = win[0] + shift_planes[0]
    candy = win[1] + shift_planes[1]
    candz = win[2] + shift_planes[2]
    candq = win[3]

    def _kernel(cr, cellmap):
        key = (float(cutoff), float(alpha), float(coulomb), (nx, ny, nz),
               c, num_excl, interpret, cr, cellmap)
        if key not in _KERNEL_CACHE:
            _KERNEL_CACHE[key] = make_pme_window_kernel(
                cutoff, alpha, coulomb, (nx, ny, nz), c, num_excl,
                interpret=interpret, center_rows=cr, use_cellmap=cellmap)
        return _KERNEL_CACHE[key]

    bucketed = (small_cap is not None and num_big is not None
                and 0 < int(num_big) < ncells and int(small_cap) < c)
    if not bucketed:
        e_slots = _kernel(None, False)(candx, candy, candz, candq,
                                       centers, excl_table)
        return jnp.sum(e_slots), max_occ

    from ..neighbors.window import _perm_gather, _perm_gather_mid
    sc = int(small_cap)
    nb = int(num_big)
    is_big = occupancy > sc
    n_big_true = jnp.sum(is_big.astype(jnp.int32))
    perm = jnp.argsort(~is_big, stable=True).astype(jnp.int32)
    inv_perm = jnp.zeros((ncells,), jnp.int32).at[perm].set(
        jnp.arange(ncells, dtype=jnp.int32))
    cand = jnp.stack([candx, candy, candz, candq])      # [4, ncells, kk]
    candp = _perm_gather_mid(cand, perm, inv_perm)
    ctrp = _perm_gather(centers, perm, inv_perm)
    exclp = excl_table[perm]                            # int32, non-diff
    e_big = _kernel(None, True)(
        candp[0, :nb], candp[1, :nb], candp[2, :nb], candp[3, :nb],
        ctrp[:nb], exclp[:nb], perm[:nb])
    e_small = _kernel(sc, True)(
        candp[0, nb:], candp[1, nb:], candp[2, nb:], candp[3, nb:],
        ctrp[nb:, :sc], exclp[nb:, :sc], perm[nb:])
    energy = jnp.sum(e_big) + jnp.sum(e_small)
    # Fold big-cell-count overflow into the occupancy channel: callers'
    # `occupancy > capacity` checks must fire when any planned-small cell
    # actually held > small_cap atoms (its rows beyond small_cap dropped).
    max_occ_eff = jnp.where(n_big_true <= nb, max_occ,
                            jnp.int32(2 ** 30 - 1))
    return energy, max_occ_eff


def pme_window_occupancy(positions: Array, box: Array,
                         ncells3: Tuple[int, int, int]) -> Array:
    """TRUE max atoms-per-cell on the window grid, as data (the
    soft-failure count for ``pme_direct_window``)."""
    from ..geometry import box_transform
    nx, ny, nz = (int(v) for v in ncells3)
    inv = jnp.linalg.inv(box)
    frac = box_transform(positions, inv)
    frac = frac - jnp.floor(frac)
    ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
    cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0,
                     ncells_arr - 1)
    cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]
    counts = jax.ops.segment_sum(jnp.ones_like(cell_id), cell_id,
                                 num_segments=nx * ny * nz)
    return jnp.max(counts)


def pme_window_count_overflow(positions: Array, box: Array,
                              window_plan) -> Array:
    """Soft-failure channel for a BUCKETED window plan: returns a value
    above the plan's capacity iff more cells exceed small_cap than the
    planned num_big (those cells' center rows beyond small_cap were
    dropped), else 0 — so one `occupancy > capacity` check covers both
    the per-cell and the big-cell-count limits."""
    from ..geometry import box_transform
    ncells3, capacity, small_cap, num_big = window_plan[:4]
    nx, ny, nz = (int(v) for v in ncells3)
    inv = jnp.linalg.inv(box)
    frac = box_transform(positions, inv)
    frac = frac - jnp.floor(frac)
    ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
    cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0,
                     ncells_arr - 1)
    cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]
    counts = jax.ops.segment_sum(jnp.ones_like(cell_id), cell_id,
                                 num_segments=nx * ny * nz)
    n_big = jnp.sum((counts > int(small_cap)).astype(jnp.int32))
    return jnp.where(n_big <= int(num_big), 0,
                     jnp.int32(int(capacity) + 1))


def plan_pme_window(box, cutoff: float, positions,
                    margin: float = 1.25, bucket: bool = False):
    """Host-side planner: (ncells3, capacity) for the window direct path,
    or (None, None) when the box is under 3 cells wide. Capacity comes
    from the TRUE max cell occupancy of ``positions`` times ``margin``
    (density fluctuations during MD are absorbed by the margin; beyond it
    is the observable ``pme_window_occupancy`` soft failure).

    ``bucket``: additionally plan cell-occupancy bucketing — returns
    (ncells3, capacity, small_cap, num_big) with small_cap sized to the
    90th-percentile occupancy (+10% margin) and num_big to 1.5x the
    observed big-cell count (+4), both soft-failure-guarded at runtime.
    Falls back to (ncells3, capacity, None, None) when the distribution
    offers no useful split."""
    from ..neighbors.cell_list import _perpendicular_widths
    box_np = np.asarray(box, np.float64)
    widths = _perpendicular_widths(box_np)
    nc = np.maximum(np.floor(widths / float(cutoff)).astype(int), 1)
    if (nc < 3).any():
        return (None, None, None, None) if bucket else (None, None)
    nx, ny, nz = (int(v) for v in nc)
    frac = np.asarray(positions, np.float64) @ np.linalg.inv(box_np)
    frac -= np.floor(frac)
    cell3 = np.minimum((frac * nc).astype(int), nc - 1)
    cid = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]
    occ = np.bincount(cid, minlength=nx * ny * nz)
    true_max = int(occ.max())
    cap = int(np.ceil(true_max * margin)) + 1
    cap = -(-cap // 8) * 8
    if not bucket:
        return (nx, ny, nz), cap
    small = int(np.ceil(np.percentile(occ, 90) * 1.1)) + 1
    small = -(-small // 8) * 8
    nbig = min(len(occ), int(np.ceil(np.sum(occ > small) * 1.5)) + 4)
    if small >= cap or nbig >= len(occ):
        return (nx, ny, nz), cap, None, None
    return (nx, ny, nz), cap, small, nbig
