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
                           interpret: Optional[bool] = None):
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
    """
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    rc = float(cutoff)
    al = float(alpha)
    ke = float(coulomb)
    nx, ny, nz = (int(v) for v in ncells3)
    ncells = nx * ny * nz
    c = int(capacity)
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
        hi = int(max(8, min(64, budget, -(-c // 8) * 8)))
        # Among 8-multiples that fit VMEM, keep blocks at >= 4 sublane
        # tiles when the budget allows (narrow tiles are the instruction
        # wall), then minimize padded-row waste (ceil(c/rb)*rb),
        # tie-broken toward wider blocks.
        cands = range(min(32, hi), hi + 1, 8)
        return min(cands, key=lambda r: (-(-c // r) * r, -r))

    rb_f = _pick_rb(7)
    rb_b = _pick_rb(14)
    cpad_f = -(-c // rb_f) * rb_f
    cpad_b = -(-c // rb_b) * rb_b

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

    def fwd_kernel(cx_ref, cy_ref, cz_ref, cq_ref, ctr_ref, excl_ref,
                   out_ref):
        a = pl.program_id(0)
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

    def bwd_kernel(cx_ref, cy_ref, cz_ref, cq_ref, ctr_ref, excl_ref,
                   g_ref, dcx_ref, dcy_ref, dcz_ref, dcq_ref, dctr_ref):
        a = pl.program_id(0)
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
        return pl.BlockSpec((1, 1, kk), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def row_spec(rows, width):
        return pl.BlockSpec((1, rows, width), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def _mid(x):
        return x.reshape(x.shape[0], 1, x.shape[1])

    def _pad_rows(x, cpad, fill):
        if cpad == c:
            return x
        return jnp.concatenate(
            [x, jnp.full((x.shape[0], cpad - c) + x.shape[2:], fill,
                         x.dtype)], axis=1)

    def run_fwd(candx, candy, candz, candq, centers, excl):
        out = pl.pallas_call(
            fwd_kernel,
            grid=(ncells, cpad_f // rb_f),
            in_specs=[lane_spec()] * 4 + [row_spec(rb_f, 4),
                                          row_spec(rb_f, ne)],
            out_specs=row_spec(rb_f, 1),
            out_shape=jax.ShapeDtypeStruct((ncells, cpad_f, 1),
                                           jnp.float32),
            interpret=interpret,
        )(_mid(candx), _mid(candy), _mid(candz), _mid(candq),
          _pad_rows(centers, cpad_f, 2.0 * FAR),
          _pad_rows(excl, cpad_f, -1))
        return out[:, :c]

    def run_bwd(candx, candy, candz, candq, centers, excl, g):
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(ncells, cpad_b // rb_b),
            in_specs=[lane_spec()] * 4 + [row_spec(rb_b, 4),
                                          row_spec(rb_b, ne),
                                          row_spec(rb_b, 1)],
            out_specs=(lane_spec(),) * 4 + (row_spec(rb_b, 4),),
            out_shape=(jax.ShapeDtypeStruct((ncells, 1, kk), jnp.float32),
                       jax.ShapeDtypeStruct((ncells, 1, kk), jnp.float32),
                       jax.ShapeDtypeStruct((ncells, 1, kk), jnp.float32),
                       jax.ShapeDtypeStruct((ncells, 1, kk), jnp.float32),
                       jax.ShapeDtypeStruct((ncells, cpad_b, 4),
                                            jnp.float32)),
            interpret=interpret,
        )(_mid(candx), _mid(candy), _mid(candz), _mid(candq),
          _pad_rows(centers, cpad_b, 2.0 * FAR),
          _pad_rows(excl, cpad_b, -1), _pad_rows(g, cpad_b, 0.0))
        dcx, dcy, dcz, dcq, dctr = outs
        return (dcx.reshape(ncells, kk), dcy.reshape(ncells, kk),
                dcz.reshape(ncells, kk), dcq.reshape(ncells, kk),
                dctr[:, :c])

    @jax.custom_vjp
    def pme_window(candx, candy, candz, candq, centers, excl):
        return run_fwd(candx, candy, candz, candq, centers, excl)

    def _fwd(candx, candy, candz, candq, centers, excl):
        return (run_fwd(candx, candy, candz, candq, centers, excl),
                (candx, candy, candz, candq, centers, excl))

    def _bwd(res, g):
        candx, candy, candz, candq, centers, excl = res
        dcx, dcy, dcz, dcq, dctr = run_bwd(candx, candy, candz, candq,
                                           centers, excl,
                                           g.astype(jnp.float32))
        return dcx, dcy, dcz, dcq, dctr, None

    pme_window.defvjp(_fwd, _bwd)
    return pme_window


_KERNEL_CACHE: dict = {}


def pme_direct_window(positions: Array, charges: Array, box: Array,
                      exclusions: Array, cutoff: float, alpha: float,
                      coulomb: float, ncells3: Tuple[int, int, int],
                      capacity: int,
                      interpret: Optional[bool] = None):
    """Direct-space Ewald energy via the dense per-cell window kernel.

    ``ncells3``/``capacity``: cell grid (>= 3 per axis, cell width >=
    cutoff) and per-cell slot capacity. Returns (energy, max_occupancy) —
    the occupancy is the usual soft-failure count (compare against
    ``capacity`` between jitted calls; getNeighborPairs.py:77-83).
    Differentiable in positions, charges, and box.
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

    key = (float(cutoff), float(alpha), float(coulomb), (nx, ny, nz), c,
           num_excl, interpret)
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = make_pme_window_kernel(
            cutoff, alpha, coulomb, (nx, ny, nz), c, num_excl,
            interpret=interpret)
    e_slots = _KERNEL_CACHE[key](candx, candy, candz, candq, centers,
                                 excl_table)
    return jnp.sum(e_slots), max_occ


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


def plan_pme_window(box, cutoff: float, positions,
                    margin: float = 1.25):
    """Host-side planner: (ncells3, capacity) for the window direct path,
    or (None, None) when the box is under 3 cells wide. Capacity comes
    from the TRUE max cell occupancy of ``positions`` times ``margin``
    (density fluctuations during MD are absorbed by the margin; beyond it
    is the observable ``pme_window_occupancy`` soft failure)."""
    from ..neighbors.cell_list import _perpendicular_widths
    box_np = np.asarray(box, np.float64)
    widths = _perpendicular_widths(box_np)
    nc = np.maximum(np.floor(widths / float(cutoff)).astype(int), 1)
    if (nc < 3).any():
        return None, None
    nx, ny, nz = (int(v) for v in nc)
    frac = np.asarray(positions, np.float64) @ np.linalg.inv(box_np)
    frac -= np.floor(frac)
    cell3 = np.minimum((frac * nc).astype(int), nc - 1)
    cid = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]
    true_max = int(np.bincount(cid, minlength=nx * ny * nz).max())
    cap = int(np.ceil(true_max * margin)) + 1
    cap = -(-cap // 8) * 8
    return (nx, ny, nz), cap
