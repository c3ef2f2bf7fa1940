"""Symmetric cell-pair window radial AEV — a Pallas TPU kernel.

The dense 27-cell window kernel (``pallas_window``) computes every
DIRECTED pair: each atom pair (i, j) is visited twice, once from each
center's window, so ~45% of its VPU work (the Gaussian ladder on the pair
distance) is redundant — the reference's CPU path exploits exactly this
symmetry by accumulating both atoms' radial rows from one half-list pass
(CpuANISymmetryFunctions.cpp:128-150). This kernel restores the symmetry
win with a TPU-shaped decomposition:

* lanes are Z-TRIPLES: for each cell, the species-major concatenation of
  its z-1 / z / z+1 cells' slots (``L = 3 * c`` lanes, built by dense
  rolls of the coordinate PLANES — large-minor-axis layouts throughout;
  the naive [cells, slots, 3] layout lane-pads 42x). With typical cell
  capacities ``3c`` lands near the 128-lane tile;
* the xy-plane neighbor offsets are cut in half: the self column (0,0)
  owns every directed pair inside its z-column, plus the four half
  offsets (1,0), (0,1), (1,1), (1,-1). Each unordered column pair is
  visited once: the kernel accumulates the center-side rows [c, out_w]
  AND the neighbor-side rows as a transposed [out_w, L] block, cutting
  pair-slot work ~45% vs the 27-entry window;
* ONE ``pallas_call`` per direction (fwd / bwd) covers all five offsets:
  the z-triple array is passed five times with five BlockSpec index maps
  (pure index arithmetic — no materialized window), so the per-grid-step
  overhead that dominated a call-per-offset variant is amortized 5x;
* the neighbor-side blocks fold back onto their home cells with static
  3-axis ``jnp.roll``s over merged [out_w*cap] lanes (the XLA transpose
  of a roll is a roll — the fold stays scatter-free under ``jax.grad``),
  and periodic xy-image shifts enter as per-(cell, offset) scalars;
* the backward kernel recomputes the pair geometry (the reference CUDA
  backprop strategy, CudaANISymmetryFunctions.cu:389-418) and emits
  center-row, per-offset z-triple-lane, and shift cotangents; everything
  outside the kernels is rolls/concats/slices, which XLA transposes
  exactly.

Species membership of rows and lanes is static (species-sub-blocked cell
slots), so all per-species reductions are contiguous slices, as in
``pallas_window``.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_window import FAR, make_radial_ladder

Array = jnp.ndarray

# xy-plane half offsets: (0,0) self-column + 4 of the 8 neighbors; the
# other 4 are covered by the neighbor-side output of their reverse.
HALF_OFFSETS = ((0, 0), (1, 0), (0, 1), (1, 1), (1, -1))


def _make_pair_kernels(ncells3, cell_caps, rc: float, etas, rs_list,
                       scale: float, interpret: bool):
    """(fwd, bwd)-in-one custom_vjp over a single fused pallas_call:
    f(ctr_cells [ncells, c, 3], z3 [ncells, 3, L], shift [ncells, 4, 3])
    -> (out_a [ncells, c, out_w], out_b [ncells, 4, out_w, L])."""
    nx, ny, nz = ncells3
    ncells = nx * ny * nz
    cell_caps = tuple(int(x) for x in cell_caps)
    npres = len(cell_caps)
    c = sum(cell_caps)
    ll = 3 * c
    n_r = len(rs_list)
    out_w = npres * n_r
    offs = np.cumsum((0,) + cell_caps)[:-1]
    row_sl = [(int(offs[s]), int(offs[s] + cell_caps[s]))
              for s in range(npres)]
    lane_sl = [(3 * int(offs[s]), 3 * int(offs[s] + cell_caps[s]))
               for s in range(npres)]
    # Self-column: row g of species s self-matches lane g + 2*off_s + cs.
    sp_shift = [2 * int(offs[s]) + cell_caps[s] for s in range(npres)]
    iter_radial_exps = make_radial_ladder(rc, tuple(etas), tuple(rs_list))

    def geometry(ctr, z3, shx, shy, shz, is_self):
        dx = z3[0:1, :] + shx - ctr[:, 0:1]
        dy = z3[1:2, :] + shy - ctr[:, 1:2]
        dz = z3[2:3, :] + shz - ctr[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        valid = d2 < rc * rc
        if is_self:
            lane = jax.lax.broadcasted_iota(jnp.int32, (c, ll), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (c, ll), 0)
            self_lane = row + sp_shift[0]
            for s in range(1, npres):
                self_lane = jnp.where(row >= int(offs[s]),
                                      row + sp_shift[s], self_lane)
            valid = valid & (lane != self_lane)
        r = jnp.sqrt(jnp.maximum(d2, 1e-12))
        fc = jnp.where(valid, 0.5 * jnp.cos(np.pi / rc * r) + 0.5, 0.0)
        return dx, dy, dz, r, fc, valid

    def offset_shifts(sh, d):
        if d == 0:
            zero = jnp.zeros((1, 1), jnp.float32)
            return zero, zero, zero
        return (sh[d - 1:d, 0:1], sh[d - 1:d, 1:2], sh[d - 1:d, 2:3])

    def fwd_kernel(ctr_ref, z0_ref, z1_ref, z2_ref, z3_ref, z4_ref, sh_ref,
                   outa_ref, outb_ref):
        ctr = ctr_ref[0]                                  # [c, 3]
        sh = sh_ref[0]                                    # [4, 3]
        z_refs = (z0_ref, z1_ref, z2_ref, z3_ref, z4_ref)
        cols = [None] * out_w
        for d in range(5):
            z3 = z_refs[d][0]                             # [3, L]
            shx, shy, shz = offset_shifts(sh, d)
            _, _, _, r, fc, _ = geometry(ctr, z3, shx, shy, shz, d == 0)
            rows = [None] * out_w
            for q, e in iter_radial_exps(r):
                we = fc * e                               # [c, L]
                for s in range(npres):
                    l0, l1 = lane_sl[s]
                    acc = scale * jnp.sum(we[:, l0:l1], axis=1,
                                          keepdims=True)
                    k = s * n_r + q
                    cols[k] = acc if cols[k] is None else cols[k] + acc
                    if d > 0:
                        r0, r1 = row_sl[s]
                        rows[k] = scale * jnp.sum(we[r0:r1, :], axis=0,
                                                  keepdims=True)
            if d > 0:
                outb_ref[0, d - 1] = jnp.concatenate(rows, axis=0)
        outa_ref[0] = jnp.concatenate(cols, axis=1)       # [c, out_w]

    def bwd_kernel(ctr_ref, z0_ref, z1_ref, z2_ref, z3_ref, z4_ref, sh_ref,
                   ga_ref, gb_ref,
                   dctr_ref, d0_ref, d1_ref, d2_ref, d3_ref, d4_ref,
                   dsh_ref):
        ctr = ctr_ref[0]
        sh = sh_ref[0]
        ga = ga_ref[0]                                    # [c, out_w]
        z_refs = (z0_ref, z1_ref, z2_ref, z3_ref, z4_ref)
        dz_refs = (d0_ref, d1_ref, d2_ref, d3_ref, d4_ref)
        dctr_acc = None
        dsh_rows = []
        for d in range(5):
            z3 = z_refs[d][0]
            shx, shy, shz = offset_shifts(sh, d)
            dx, dy, dz, r, fc, valid = geometry(ctr, z3, shx, shy, shz,
                                                d == 0)
            dfc = jnp.where(valid,
                            -0.5 * np.pi / rc * jnp.sin(np.pi / rc * r),
                            0.0)
            gb = gb_ref[0, d - 1] if d > 0 else None      # [out_w, L]
            acc = jnp.zeros((c, ll), jnp.float32)
            bcc = jnp.zeros((c, ll), jnp.float32)
            for q, e in iter_radial_exps(r):
                ga_q = jnp.concatenate(
                    [jnp.broadcast_to(ga[:, s * n_r + q:s * n_r + q + 1],
                                      (c, l1 - l0))
                     for s, (l0, l1) in enumerate(lane_sl)], axis=1)
                if gb is not None:
                    gb_q = jnp.concatenate(
                        [jnp.broadcast_to(
                            gb[s * n_r + q:s * n_r + q + 1, :],
                            (r1 - r0, ll))
                         for s, (r0, r1) in enumerate(row_sl)], axis=0)
                    gsum = ga_q + gb_q
                else:
                    gsum = ga_q
                ge = gsum * e
                acc = acc + ge
                bcc = bcc + ge * (etas[q] * (r - rs_list[q]))
            alpha = dfc * acc - 2.0 * fc * bcc
            coef = (scale * alpha) / r                    # 0 on invalid
            gx = coef * dx
            gy = coef * dy
            gz = coef * dz
            dc = jnp.concatenate(
                [-jnp.sum(gx, axis=1, keepdims=True),
                 -jnp.sum(gy, axis=1, keepdims=True),
                 -jnp.sum(gz, axis=1, keepdims=True)], axis=1)
            dctr_acc = dc if dctr_acc is None else dctr_acc + dc
            sx = jnp.sum(gx, axis=0, keepdims=True)
            sy = jnp.sum(gy, axis=0, keepdims=True)
            sz = jnp.sum(gz, axis=0, keepdims=True)
            dz_refs[d][0] = jnp.concatenate([sx, sy, sz], axis=0)
            if d > 0:
                dsh_rows.append(jnp.concatenate(
                    [jnp.sum(sx, axis=1, keepdims=True),
                     jnp.sum(sy, axis=1, keepdims=True),
                     jnp.sum(sz, axis=1, keepdims=True)], axis=1))
        dctr_ref[0] = dctr_acc
        dsh_ref[0] = jnp.concatenate(dsh_rows, axis=0)    # [4, 3]

    def ident(a):
        return (a, 0, 0)

    def z3_index_map(offset):
        ox, oy = offset

        def index(a):
            az = a % nz
            axy = a // nz
            ay = axy % ny
            ax = axy // ny
            bx = (ax + ox + nx) % nx
            by = (ay + oy + ny) % ny
            return ((bx * ny + by) * nz + az, 0, 0)
        return index

    def spec(shape, index=None):
        if index is None:
            index = lambda a: (a,) + (0,) * len(shape)
        return pl.BlockSpec((1,) + shape, index, memory_space=pltpu.VMEM)

    z3_specs = [spec((3, ll), lambda a, _i=z3_index_map(o): _i(a))
                for o in HALF_OFFSETS]

    def run_fwd(ctr_cells, z3, shift):
        return pl.pallas_call(
            fwd_kernel,
            grid=(ncells,),
            in_specs=[spec((c, 3))] + z3_specs + [spec((4, 3))],
            out_specs=(spec((c, out_w)), spec((4, out_w, ll))),
            out_shape=(jax.ShapeDtypeStruct((ncells, c, out_w),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((ncells, 4, out_w, ll),
                                            jnp.float32)),
            interpret=interpret,
        )(ctr_cells, z3, z3, z3, z3, z3, shift)

    def run_bwd(ctr_cells, z3, shift, ga, gb):
        dz_shape = jax.ShapeDtypeStruct((ncells, 3, ll), jnp.float32)
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(ncells,),
            in_specs=([spec((c, 3))] + z3_specs
                      + [spec((4, 3)), spec((c, out_w)),
                         spec((4, out_w, ll))]),
            out_specs=(spec((c, 3)),) + tuple(z3_specs) + (spec((4, 3)),),
            out_shape=((jax.ShapeDtypeStruct((ncells, c, 3), jnp.float32),)
                       + (dz_shape,) * 5
                       + (jax.ShapeDtypeStruct((ncells, 4, 3),
                                               jnp.float32),)),
            interpret=interpret,
        )(ctr_cells, z3, z3, z3, z3, z3, shift, ga, gb)
        dctr, dzs, dsh = outs[0], outs[1:6], outs[6]
        # Each dz output is written at its offset's WINDOW cell (the same
        # bijective index map as the input), i.e. already in z3 layout.
        dz3 = dzs[0]
        for d in dzs[1:]:
            dz3 = dz3 + d
        return dctr, dz3, dsh

    @jax.custom_vjp
    def pair_call(ctr_cells, z3, shift):
        return run_fwd(ctr_cells, z3, shift)

    def _fwd(ctr_cells, z3, shift):
        return run_fwd(ctr_cells, z3, shift), (ctr_cells, z3, shift)

    def _bwd(res, g):
        ctr_cells, z3, shift = res
        ga, gb = g
        return run_bwd(ctr_cells, z3, shift, ga.astype(jnp.float32),
                       gb.astype(jnp.float32))

    pair_call.defvjp(_fwd, _bwd)
    return pair_call


@functools.lru_cache(maxsize=16)
def _xy_shift_factors(ncells3: Tuple[int, int, int]) -> np.ndarray:
    """[ncells, 4, 2] periodic wrap factors (fx, fy) of cell a's four
    half-offset neighbor columns."""
    nx, ny, nz = ncells3
    ax = np.arange(nx)[:, None, None]
    ay = np.arange(ny)[None, :, None]
    out = np.zeros((nx, ny, nz, 4, 2), np.int8)
    for d, (ox, oy) in enumerate(HALF_OFFSETS[1:]):
        out[..., d, 0] = np.broadcast_to(np.floor_divide(ax + ox, nx),
                                         (nx, ny, nz))
        out[..., d, 1] = np.broadcast_to(np.floor_divide(ay + oy, ny),
                                         (nx, ny, nz))
    return out.reshape(nx * ny * nz, 4, 2)


def _build_z3(slots: Array, box: Array, ncells3, cell_caps) -> Array:
    """[ncells, 3, L] z-triple coordinate planes: per species s, lanes
    [z-1 | z | z+1] slots of that species, periodic z-images shifted into
    place. Built in PLANE layout ([3, ..., slots]-minor) — the
    [..., slots, 3] alternative lane-pads 42x (NOTES_PERF)."""
    nx, ny, nz = ncells3
    cell_caps = tuple(int(x) for x in cell_caps)
    c = sum(cell_caps)
    offs = np.cumsum((0,) + cell_caps)[:-1]
    p4 = slots.T.reshape(3, nx * ny, nz, c)               # coordinate planes
    zmask0 = (jnp.arange(nz) == 0)[None, None, :, None]
    zmaskn = (jnp.arange(nz) == nz - 1)[None, None, :, None]
    boxz = box[2].reshape(3, 1, 1, 1)
    zm = jnp.roll(p4, 1, axis=2)
    zm = jnp.where(zmask0, zm - boxz, zm)
    zp = jnp.roll(p4, -1, axis=2)
    zp = jnp.where(zmaskn, zp + boxz, zp)
    parts = []
    for s, cs in enumerate(cell_caps):
        sl = slice(int(offs[s]), int(offs[s]) + cs)
        parts.extend([zm[..., sl], p4[..., sl], zp[..., sl]])
    z3 = jnp.concatenate(parts, axis=3)                   # [3, nxy, nz, L]
    return z3.reshape(3, nx * ny * nz, 3 * c).transpose(1, 0, 2)


def _fold_b(out_b: Array, ncells3, cell_caps, out_w: int) -> Array:
    """Fold the neighbor-side blocks onto their home cells: out_b[a, d, :, l]
    (lane l = species s, z offset dz, rank rk of column a_xy + off_d)
    belongs to cell (a_xy + off_d, a_z + dz) slot (s, rk). Static 3-axis
    rolls over merged [out_w * cap] minor lanes (keeps the minor axis
    tile-sized; the XLA transpose of a roll is a roll)."""
    nx, ny, nz = ncells3
    cell_caps = tuple(int(x) for x in cell_caps)
    offs = np.cumsum((0,) + cell_caps)[:-1]
    ob = out_b.reshape(nx, ny, nz, 4, out_w, 3 * sum(cell_caps))
    pieces = [None] * len(cell_caps)
    for d, (ox, oy) in enumerate(HALF_OFFSETS[1:]):
        for s, cs in enumerate(cell_caps):
            base = 3 * int(offs[s])
            for dzi, dz in enumerate((-1, 0, 1)):
                sl = ob[:, :, :, d, :, base + dzi * cs: base + (dzi + 1) * cs]
                sl = sl.reshape(nx, ny, nz, out_w * cs)
                sl = jnp.roll(sl, (ox, oy, dz), axis=(0, 1, 2))
                pieces[s] = sl if pieces[s] is None else pieces[s] + sl
    cells = [p.reshape(nx * ny * nz, out_w, cs).transpose(0, 2, 1)
             for p, cs in zip(pieces, cell_caps)]
    return jnp.concatenate(cells, axis=1)                 # [ncells, c, out_w]


_KERNEL_CACHE: dict = {}


def pair_radial_aev(slots: Array, box: Array,
                    ncells3: Tuple[int, int, int],
                    cell_caps: Tuple[int, ...],
                    radial_cutoff: float, radial_eta: Sequence[float],
                    radial_rs: Sequence[float], torchani: bool,
                    interpret: Optional[bool] = None) -> Array:
    """Radial AEV [ncells, c, npres * n_r] in cell-slot space from the
    species-sub-blocked slot positions ``slots`` [ncells * c, 3]
    (wrapped primary-box positions; empty slots at the FAR sentinel).
    Differentiable in ``slots`` and ``box``."""
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    nx, ny, nz = (int(x) for x in ncells3)
    cell_caps = tuple(int(x) for x in cell_caps)
    c = sum(cell_caps)
    ncells = nx * ny * nz
    rs_list = tuple(float(x) for x in radial_rs)
    etas = tuple(float(x) for x in radial_eta)
    if len(etas) == 1:
        etas = etas * len(rs_list)
    out_w = len(cell_caps) * len(rs_list)
    scale = 0.25 if torchani else 1.0

    key = ((nx, ny, nz), cell_caps, float(radial_cutoff), etas, rs_list,
           scale, interpret)
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = _make_pair_kernels(
            (nx, ny, nz), cell_caps, float(radial_cutoff), etas, rs_list,
            scale, interpret)
    ctr_cells = slots.reshape(ncells, c, 3)
    z3 = _build_z3(slots, box, (nx, ny, nz), cell_caps)
    # Elementwise, not a matmul: a bf16 MXU pass would round the box
    # vectors to 8 mantissa bits (~0.25 A at a 64 A box).
    ff = jnp.asarray(_xy_shift_factors((nx, ny, nz)), slots.dtype)
    shift = ff[..., 0:1] * box[0] + ff[..., 1:2] * box[1]  # [ncells, 4, 3]
    out_a, out_b = _KERNEL_CACHE[key](ctr_cells, z3, shift)
    return out_a + _fold_b(out_b, (nx, ny, nz), cell_caps, out_w)
