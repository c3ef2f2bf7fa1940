"""Fused per-cell window radial AEV — a Pallas TPU kernel.

The reference accumulates the radial symmetry functions by looping a
compacted per-atom neighbor list and atomically scattering per-species
(CpuANISymmetryFunctions.cpp:141-147, CudaANISymmetryFunctions.cu:198-226).
Every prior formulation here kept that per-atom neighbor-lane structure,
which on TPU costs one latency-bound HBM row gather per (atom, lane) —
~3-5 ns/row regardless of row width, ~10 ms at 26k atoms — plus a
mirror-list adjoint of the same size.

This kernel removes the per-atom radial list entirely. The radial AEV of
every atom in a cell is computed from the cell's dense 27-cell candidate
window (``kk = 27 * cell_capacity`` slots), which is built by COARSE
cell-granularity block copies (pure bandwidth, no per-row latency):

* grid = one step per cell; candidates [kk] on lanes, the cell's own
  ``c`` slots as center rows — every pair quantity is a [c, kk] VMEM
  array, nothing spills to HBM;
* species masks come from a frozen per-refresh window species map
  (empty slots carry a sentinel species and a far-away position, so they
  fail both the species mask and the cutoff test);
* the backward pass recomputes the pair geometry (the reference's CUDA
  backprop strategy, CudaANISymmetryFunctions.cu:389-418) and emits
  per-window candidate cotangents — the scatter back to atoms is again
  coarse (cell-granularity), never per-row;
* there is no radial capacity at all: the window provably contains every
  neighbor within the cutoff while the Verlet-skin contract holds, so
  the only soft-failure mode left is cell-capacity overflow (observable
  via ``max_cell_occupancy``, the ``number_found_pairs`` contract of
  getNeighborPairs.py:77-83).

No MXU involvement and no selection matmuls — pair deltas are formed
directly on the VPU in f32, so this path has none of the bf16-pass
precision loss of matmul-based expansions (NOTES_PERF.md).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# Empty-slot position sentinel: far enough that d2 > cutoff^2 for any real
# configuration, small enough that squares stay comfortably finite in f32.
FAR = 1.0e6
# Stencil entry index of the cell itself in CellList._stencil's (-1,0,1)^3
# meshgrid enumeration (entry 13 = offset (0,0,0)).
SELF_STENCIL_INDEX = 13


# Degree-8 Chebyshev-node LSQ fit of g(t) = 0.5 cos(pi sqrt(t)) + 0.5 on
# t in [0, 1] (cos of a sqrt is ENTIRE in t, so a low-degree polynomial is
# exact to f64 roundoff: max |fc err| 4.7e-13, max |dfc/dt err| 7.6e-11 —
# both far below f32 resolution). Lets the cutoff function and its
# derivative run as Horner chains in d2 instead of sqrt+cos / sin.
# Coefficients low-order-first.
FC_COEFFS = (0.99999999999953115, -2.4674011001964282, 2.0293560611802657,
             -0.66763136355346187, 0.11766520747089387,
             -0.012903133084020298, 0.00096425294148109802,
             -5.1784521003695567e-05, 1.8597632061664595e-06)


def fc_poly_t(t):
    """fc as a function of t = (r/rc)^2, UNMASKED (caller applies the
    r < rc mask). t must be clamped to [0, 1] first."""
    p = FC_COEFFS[-1]
    for cf in FC_COEFFS[-2::-1]:
        p = p * t + cf
    return p


def dfc_poly_t(t):
    """d fc / dt at t = (r/rc)^2; chain rule: dfc/dr = dfc_poly_t * 2 r /
    rc^2."""
    p = FC_COEFFS[-1] * 8.0
    for k in range(7, 0, -1):
        p = p * t + FC_COEFFS[k] * k
    return p


def make_radial_ladder(rc: float, etas: Tuple[float, ...],
                       rs_list: Tuple[float, ...]):
    """Build the lazy Gaussian-grid generator shared by the radial kernels.

    Uniform-grid Gaussian ladder: for an evenly spaced rs grid with one
    eta, e_{q+1}/e_q = exp(2 eta d u_q - eta d^2) factors into one
    pair-dependent base times constant powers, so each HALF of the grid
    costs 2 exps + 1 reciprocal + 2 multiplies per point instead of one
    exp per point. exp is the kernel's dominant cost (16 per pair slot,
    multi-pass on the VPU). Two ladder centers are REQUIRED at ANI-2x
    constants, not just an accuracy nicety: a single center puts the
    center exp at eta*u0^2 up to ~174 for in-range r near the grid edges,
    under the f32 normal floor (e^-87.3), so e0 flushes to zero and the
    chain then reports 0 for entries whose true value is ~1 (measured:
    max abs error 1.0 with one center vs 3e-9 with two). Exact-match
    tests guard the fallback path.

    Returns ``iter_radial_exps(r)`` yielding ``(q, e_q(r))`` in ladder
    order — LAZY, so only the running product stays live (holding all n_r
    arrays at once was measured to spill VMEM and triple the backward
    kernel). r is clamped to the cutoff first: beyond rc every consumer
    multiplies by an exact-zero fc/mask, and unclamped FAR-sentinel
    distances would overflow the ladder base to inf (0 * inf = NaN).
    """
    n_r = len(rs_list)
    diffs = np.diff(rs_list) if n_r > 1 else np.zeros(0)
    ladder = (n_r >= 8 and len(set(etas)) == 1
              and np.all(np.abs(diffs - diffs[0]) < 1e-5 * abs(diffs[0])))
    if ladder:
        l_eta = etas[0]
        l_d = float(diffs[0])
        l_c1 = math.exp(-l_eta * l_d * l_d)
        l_c2 = l_c1 * l_c1
        n_half = (n_r + 7) // 8
        bounds = [(h * n_r // n_half, (h + 1) * n_r // n_half)
                  for h in range(n_half)]

    def iter_radial_exps(r):
        if not ladder:
            for q in range(n_r):
                yield q, jnp.exp(-etas[q] * (r - rs_list[q]) ** 2)
            return
        r = jnp.minimum(r, rc)
        for h0, h1 in bounds:
            s0 = (h0 + h1) // 2
            u0 = r - rs_list[s0]
            e0 = jnp.exp(-l_eta * (u0 * u0))
            t = jnp.exp((2.0 * l_eta * l_d) * u0)
            yield s0, e0
            run = t * l_c1
            cur = e0
            for q in range(s0 + 1, h1):
                cur = cur * run
                run = run * l_c2
                yield q, cur
            t_inv = 1.0 / t
            run = t_inv * l_c1
            cur = e0
            for q in range(s0 - 1, h0 - 1, -1):
                cur = cur * run
                run = run * l_c2
                yield q, cur

    return iter_radial_exps


def make_window_radial_kernel(radial_cutoff: float,
                              radial_eta: Sequence[float],
                              radial_rs: Sequence[float],
                              cell_caps: Tuple[int, ...],
                              torchani: bool,
                              interpret: Optional[bool] = None,
                              center_caps: Optional[Tuple[int, ...]] = None,
                              fc_impl: str = 'poly'):
    """Build the fused window-radial function for one configuration.

    Returns ``fn(candx, candy, candz, centers) -> [ncells, c, P*R]`` where

    * ``candx/y/z``: [ncells, kk] candidate coordinate planes in
      SPECIES-MAJOR window order (present species s occupies lanes
      [27*sum(cell_caps[:s]), 27*sum(cell_caps[:s+1])), entry-major within
      its block; periodic image shifts already applied; empty slots FAR),
    * ``centers``: [ncells, c, 3] the cells' own slot positions
      (species-sub-blocked ranks, c = sum(cell_caps)),
    * output column ``p * R + q`` = unnormalized radial function q against
      present-species p (the caller places present species into the full
      [S, R] AEV layout).

    Species membership of every lane is static, so the per-species
    reductions are contiguous lane slices — no species masks or win_sp
    table anywhere. Differentiable in (candx, candy, candz, centers) via a
    custom VJP kernel (recompute strategy).

    ``center_caps``: per-species CENTER-row capacities <= cell_caps for the
    low-occupancy cell class (cell-occupancy bucketing): centers arrive
    packed [ncells, sum(center_caps), 3] (species sub-blocks tightened to
    center_caps) while the candidate window keeps the full cell_caps slot
    structure — mean occupancy is ~half the worst-case capacity, so
    processing sparse cells at tight row counts cuts the kernel's row
    padding ~35%.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    rc = float(radial_cutoff)
    rs_list = tuple(float(x) for x in radial_rs)
    n_r = len(rs_list)
    etas = tuple(float(x) for x in radial_eta)
    if len(etas) == 1:
        etas = etas * n_r
    if len(etas) != n_r:
        raise ValueError('radial_eta must have length 1 or len(radial_rs)')
    cell_caps = tuple(int(x) for x in cell_caps)
    c = sum(cell_caps)
    kk = 27 * c
    npres = len(cell_caps)
    out_w = npres * n_r
    scale = 0.25 if torchani else 1.0
    # Species-major window bounds and the static self-lane of each center
    # row: row k (species s, within-species rank rk) sits at its block's
    # stencil entry 13, lane wb_s + 13 * c_s + rk.
    offs = np.cumsum((0,) + cell_caps)[:-1]
    wb = 27 * offs
    sp_bounds = [(int(wb[s]), int(wb[s] + 27 * cell_caps[s]))
                 for s in range(npres)]
    # Center-row packing (cell-occupancy bucketing): species s contributes
    # ctr_caps[s] center rows; its self window lane still uses the FULL
    # cell_caps slot geometry (wb_s + 13 * c_s + within-species rank).
    ctr_caps = (tuple(int(x) for x in center_caps)
                if center_caps is not None else cell_caps)
    if len(ctr_caps) != npres or any(
            a > b for a, b in zip(ctr_caps, cell_caps)):
        raise ValueError('center_caps must align with and not exceed '
                         'cell_caps')
    c_ctr = sum(ctr_caps)
    ctr_offs = np.cumsum((0,) + ctr_caps)[:-1]
    # Row k in species block s self-matches at lane row + shift_s where
    # shift_s = wb_s + 13 * c_s - ctr_off_s (piecewise-constant per block,
    # built from iota in-kernel: Pallas kernels cannot capture arrays).
    sp_shift = [int(wb[s] + SELF_STENCIL_INDEX * cell_caps[s] - ctr_offs[s])
                for s in range(npres)]

    iter_radial_exps = make_radial_ladder(rc, etas, rs_list)

    def pair_geometry(candx, candy, candz, centers):
        """[G, c, kk] pair deltas/r/fc from [G, 1, kk] windows and
        [G, c, 3] centers.

        Self-pairs are excluded by the static window-position identity
        (center row k lives at window column self_base + k); empty slots
        fail the cutoff via the FAR sentinel.
        """
        dx = candx - centers[:, :, 0:1]
        dy = candy - centers[:, :, 1:2]
        dz = candz - centers[:, :, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        lane = jax.lax.broadcasted_iota(jnp.int32, (c_ctr, kk), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (c_ctr, kk), 0)
        self_lane = row + sp_shift[0]
        for s in range(1, npres):
            self_lane = jnp.where(row >= int(ctr_offs[s]),
                                  row + sp_shift[s], self_lane)
        valid = (d2 < rc * rc) & (lane != self_lane)[None]
        r = jnp.sqrt(jnp.maximum(d2, 1e-12))
        if fc_impl == 'poly':
            t = jnp.minimum(d2 * (1.0 / (rc * rc)), 1.0)
            fc = jnp.where(valid, fc_poly_t(t), 0.0)
        else:
            t = None
            fc = jnp.where(valid, 0.5 * jnp.cos(math.pi / rc * r) + 0.5,
                           0.0)
        return dx, dy, dz, r, fc, valid, t

    # Mosaic requires the last two block dims to be (8, 128)-aligned OR
    # equal to the array dims; the [ncells, kk] lane arrays are therefore
    # passed as [ncells, 1, kk]. Several cells ride one grid step (block
    # (G, 1, kk)): the per-grid-step Mosaic overhead (~1 us/cell measured
    # at 26k — NOTES_PERF r3) amortizes over G cells, with G sized so the
    # live [G, c, kk] working set stays inside scoped VMEM.
    _budget = 10 * 2 ** 20

    def _cells_per_step(n_arrays: int) -> int:
        g = _budget // (n_arrays * c_ctr * kk * 4)
        return int(max(1, min(8, g)))

    g_fwd = int(os.environ.get('NNPOPS_WIN_GFWD', 0)) or _cells_per_step(7)
    g_bwd = int(os.environ.get('NNPOPS_WIN_GBWD', 0)) or _cells_per_step(13)

    def fwd_kernel(candx_ref, candy_ref, candz_ref, centers_ref, out_ref):
        cx = candx_ref[...]                               # [G, 1, kk]
        cy = candy_ref[...]
        cz = candz_ref[...]
        ctr = centers_ref[...]                            # [G, c, 3]
        _, _, _, r, fc, _, _ = pair_geometry(cx, cy, cz, ctr)
        cols = [None] * out_w
        for q, e in iter_radial_exps(r):
            we = fc * e                                   # [G, c, kk]
            for s, (b0, b1) in enumerate(sp_bounds):
                cols[s * n_r + q] = scale * jnp.sum(
                    we[:, :, b0:b1], axis=2, keepdims=True)
        out_ref[...] = jnp.concatenate(cols, axis=2)      # [G, c, out_w]

    def bwd_kernel(candx_ref, candy_ref, candz_ref, centers_ref,
                   g_ref, dcx_ref, dcy_ref, dcz_ref, dctr_ref):
        cx = candx_ref[...]
        cy = candy_ref[...]
        cz = candz_ref[...]
        ctr = centers_ref[...]
        gg = g_ref[...]                                   # [G, c, out_w]
        gb = gg.shape[0]
        dx, dy, dz, r, fc, valid, t = pair_geometry(cx, cy, cz, ctr)
        if fc_impl == 'poly':
            dfc = jnp.where(valid,
                            dfc_poly_t(t) * ((2.0 / (rc * rc)) * r), 0.0)
        else:
            dfc = jnp.where(valid, -0.5 * math.pi / rc * jnp.sin(
                math.pi / rc * r), 0.0)
        # alpha = dE/dr per pair, accumulated over each species' static
        # lane slice:
        #   A_s = sum_q g[s,q] e_q ; B_s = sum_q g[s,q] e_q eta_q u_q
        #   alpha|slice_s = dfc A_s - 2 fc B_s
        acc = [jnp.zeros((gb, c_ctr, b1 - b0), jnp.float32)
               for b0, b1 in sp_bounds]
        bcc = [jnp.zeros((gb, c_ctr, b1 - b0), jnp.float32)
               for b0, b1 in sp_bounds]
        for q, e in iter_radial_exps(r):
            eu = e * (etas[q] * (r - rs_list[q]))
            for s, (b0, b1) in enumerate(sp_bounds):
                gq = gg[:, :, s * n_r + q:s * n_r + q + 1]   # [G, c, 1]
                acc[s] = acc[s] + gq * e[:, :, b0:b1]
                bcc[s] = bcc[s] + gq * eu[:, :, b0:b1]
        alpha = jnp.concatenate(
            [dfc[:, :, b0:b1] * acc[s] - 2.0 * fc[:, :, b0:b1] * bcc[s]
             for s, (b0, b1) in enumerate(sp_bounds)], axis=2)
        coef = (scale * alpha) / r                        # 0 on invalid pairs
        gx = coef * dx
        gy = coef * dy
        gz = coef * dz
        dcx_ref[...] = jnp.sum(gx, axis=1, keepdims=True)
        dcy_ref[...] = jnp.sum(gy, axis=1, keepdims=True)
        dcz_ref[...] = jnp.sum(gz, axis=1, keepdims=True)
        dctr_ref[...] = jnp.concatenate(
            [-jnp.sum(gx, axis=2, keepdims=True),
             -jnp.sum(gy, axis=2, keepdims=True),
             -jnp.sum(gz, axis=2, keepdims=True)], axis=2)

    def lane_spec(g):
        return pl.BlockSpec((g, 1, kk), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def ctr_spec(g):
        return pl.BlockSpec((g, c_ctr, 3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def out_spec(g):
        return pl.BlockSpec((g, c_ctr, out_w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def _mid(x):
        return x.reshape(x.shape[0], 1, x.shape[1])

    def _pad_cells(x, pad, fill=0.0):
        if not pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])

    def run_fwd(candx, candy, candz, centers):
        ncells = candx.shape[0]
        pad = (-ncells) % g_fwd
        np_ = ncells + pad
        # Padded cells: candidates at FAR, centers at 2*FAR -> every pair
        # fails the cutoff on its own.
        out = pl.pallas_call(
            fwd_kernel,
            grid=(np_ // g_fwd,),
            in_specs=[lane_spec(g_fwd)] * 3 + [ctr_spec(g_fwd)],
            out_specs=out_spec(g_fwd),
            out_shape=jax.ShapeDtypeStruct((np_, c_ctr, out_w),
                                           jnp.float32),
            interpret=interpret,
        )(_pad_cells(_mid(candx), pad, FAR), _pad_cells(_mid(candy), pad, FAR),
          _pad_cells(_mid(candz), pad, FAR),
          _pad_cells(centers, pad, 2.0 * FAR))
        return out[:ncells]

    def run_bwd(candx, candy, candz, centers, g):
        ncells = candx.shape[0]
        pad = (-ncells) % g_bwd
        np_ = ncells + pad
        dcx, dcy, dcz, dctr = pl.pallas_call(
            bwd_kernel,
            grid=(np_ // g_bwd,),
            in_specs=[lane_spec(g_bwd)] * 3 + [ctr_spec(g_bwd),
                                               out_spec(g_bwd)],
            out_specs=(lane_spec(g_bwd),) * 3 + (ctr_spec(g_bwd),),
            out_shape=(jax.ShapeDtypeStruct((np_, 1, kk), jnp.float32),
                       jax.ShapeDtypeStruct((np_, 1, kk), jnp.float32),
                       jax.ShapeDtypeStruct((np_, 1, kk), jnp.float32),
                       jax.ShapeDtypeStruct((np_, c_ctr, 3),
                                            jnp.float32)),
            interpret=interpret,
        )(_pad_cells(_mid(candx), pad, FAR), _pad_cells(_mid(candy), pad, FAR),
          _pad_cells(_mid(candz), pad, FAR),
          _pad_cells(centers, pad, 2.0 * FAR), _pad_cells(g, pad))
        return (dcx[:ncells].reshape(ncells, kk),
                dcy[:ncells].reshape(ncells, kk),
                dcz[:ncells].reshape(ncells, kk), dctr[:ncells])

    @jax.custom_vjp
    def window_radial(candx, candy, candz, centers):
        return run_fwd(candx, candy, candz, centers)

    def _fwd(candx, candy, candz, centers):
        out = run_fwd(candx, candy, candz, centers)
        return out, (candx, candy, candz, centers)

    def _bwd(res, g):
        candx, candy, candz, centers = res
        dcx, dcy, dcz, dctr = run_bwd(candx, candy, candz, centers,
                                      g.astype(jnp.float32))
        return dcx, dcy, dcz, dctr

    window_radial.defvjp(_fwd, _bwd)
    return window_radial


_KERNEL_CACHE: dict = {}


def window_radial_aev(candx: Array, candy: Array, candz: Array,
                      centers: Array,
                      radial_cutoff: float, radial_eta: Sequence[float],
                      radial_rs: Sequence[float],
                      cell_caps: Tuple[int, ...],
                      torchani: bool,
                      interpret: Optional[bool] = None,
                      center_caps: Optional[Tuple[int, ...]] = None,
                      fc_impl: str = 'poly') -> Array:
    """Cached-kernel entry: [ncells, c_ctr, P*R] radial AEV in (packed)
    slot space."""
    key = (radial_cutoff, tuple(float(x) for x in radial_eta),
           tuple(float(x) for x in radial_rs),
           tuple(int(x) for x in cell_caps), torchani, interpret,
           tuple(int(x) for x in center_caps) if center_caps else None,
           fc_impl)
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = make_window_radial_kernel(
            radial_cutoff, radial_eta, radial_rs, cell_caps, torchani,
            interpret=interpret, center_caps=center_caps, fc_impl=fc_impl)
    return _KERNEL_CACHE[key](candx, candy, candz, centers)
