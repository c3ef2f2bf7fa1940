"""Pallas left-pack kernel for the window-select compaction phase.

The angular candidate phase ends with a per-species LEFT-PACK: of the ~27c
window lanes per atom, keep the <= cap valid candidate slot ids, packed to
the leading lanes. ``blocked``/``window`` did this with a full bitonic
lane sort (jax.lax.sort over [N, 27*cs] int32 — measured 4.8 ms of the 26k
select, benchmarks/probe_select_r3.py). A sort is overkill: compaction
only needs each valid lane's RANK among valid lanes, and rank is a 0/1
matmul on the MXU (valid @ lower-triangular-ones — exact in bf16), after
which cap masked row-sums extract the packed values on the VPU.

Cost model at 26k (W=768, K=48): rank matmul ~8 G bf16 MACs (~0.05 ms) +
48 masked extraction passes over [N, 384] (~1.5 G VPU ops, ~0.7 ms) vs
4.8 ms of sort passes.

Note the output packs lanes in WINDOW-LANE order (stencil-entry-major),
not slot-ascending like the sort did: every consumer (tier packing,
mirror pairing, the angular kernel's static triple tables) is
order-agnostic, and the order is still deterministic.

Reference behavior being reproduced: the per-species neighbor-list
compaction of CudaANISymmetryFunctions.cu (warp-scan compaction); this is
the MXU/VPU re-expression.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def left_pack_supported(widths) -> bool:
    """True iff ``make_left_pack``/``make_left_pack_lanes`` can compile for
    these (unpadded) per-species lane widths: the [W, W] bf16 tri constant
    plus one minimal 64-row f32 block must fit the ~14 MB scoped-VMEM
    budget. This is EXACTLY the kernels' ValueError condition — exported so
    caller fallback guards (window._compact_window_kernel, select_window's
    'mask' gate) cannot drift from it (round-4 advisor finding: a 10 MiB
    caller guard admitted widths ~2154-2290 that the kernels reject)."""
    w_tot = sum(_round_up(int(w), 128) for w in widths)
    return 12 * 2 ** 20 - 2 * w_tot * w_tot >= 64 * 6 * w_tot * 4


@functools.lru_cache(maxsize=32)
def make_left_pack(widths: Tuple[int, ...], caps: Tuple[int, ...],
                   interpret: Optional[bool] = None,
                   block_rows: Optional[int] = None):
    """Build ``fn(combo [N, W]) -> (packed [N, K], counts [N, npres])``.

    ``combo``: per species block s a [N, widths[s]] f32 slab (concatenated
    along lanes, each block zero-padded to a 128-multiple lane width by the
    caller — W = sum of padded widths) holding the candidate KEY on valid
    lanes and -1 on invalid/pad lanes. Keys must be exact in f32 (< 2^24).
    ``packed``: per block the first caps[s] valid keys in lane order
    (concatenated; K = sum(caps)), -1 beyond the count. ``counts``: the
    per-block valid totals (f32).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    widths = tuple(int(w) for w in widths)
    caps = tuple(int(k) for k in caps)
    pws = tuple(_round_up(w, 128) for w in widths)
    offs = np.cumsum((0,) + pws)
    w_tot = int(offs[-1])
    k_tot = int(sum(caps))
    npres = len(widths)
    kp = _round_up(k_tot + npres, 128)   # packed K lanes + count lanes

    # rank[l] = number of valid lanes at index <= l (inclusive cumsum):
    # one block-diagonal upper-triangular 0/1 constant (exact in bf16),
    # passed as a kernel input (Pallas kernels cannot capture arrays).
    tri_np = np.zeros((w_tot, w_tot), np.float32)
    for s in range(npres):
        a, b = int(offs[s]), int(offs[s + 1])
        tri_np[a:b, a:b] = np.tril(np.ones((b - a, b - a), np.float32)).T
    tri_np = tri_np.astype(jnp.bfloat16)     # 0/1: exact in bf16

    if block_rows is None:
        # ~6 live [B, W] f32 arrays + the [W, W] bf16 tri inside ~14 MB
        # scoped VMEM (the 2.6k box has wider lanes W=896: a fixed B=512
        # overflowed by ~1 MB on the chip).
        budget = 12 * 2 ** 20 - 2 * w_tot * w_tot
        if budget < 64 * 6 * w_tot * 4:
            # The [W, W] bf16 tri constant alone (nearly) fills scoped
            # VMEM: no block_rows choice can compile. Callers guard this
            # (window._compact_window_kernel falls back to the sort path
            # at 2*W*W > 10 MiB); fail loudly for direct misuse instead
            # of a Mosaic compile error.
            raise ValueError(
                f'left-pack lane width {w_tot} needs a '
                f'{2 * w_tot * w_tot / 2**20:.1f} MiB tri constant — too '
                'wide for scoped VMEM; use the sort-based compaction path')
        block_rows = max(64, min(512, (budget // (6 * w_tot * 4) // 64)
                                 * 64))

    def kernel(tri_ref, combo_ref, out_ref):
        x = combo_ref[...]                                  # [B, W]
        outs, cnts = [], []
        for s in range(npres):
            xs = jax.lax.slice_in_dim(x, int(offs[s]), int(offs[s + 1]),
                                      axis=1)               # [B, pw]
            vf = (xs >= 0.0).astype(jnp.float32)
            tril = tri_ref[int(offs[s]):int(offs[s + 1]),
                           int(offs[s]):int(offs[s + 1])]
            rank = jax.lax.dot_general(
                vf.astype(jnp.bfloat16), tril,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [B, pw]
            # Push invalid lanes out of the rank domain so the extraction
            # compare alone selects exactly one lane per (row, j); then
            # col_j = rowsum(where(rank==j+1, key+1, 0)) - 1 yields the key
            # where a lane exists and the -1 sentinel where none does.
            rank = rank + (1.0 - vf) * 65536.0
            xs1 = xs + 1.0
            cols = [jnp.sum(jnp.where(rank == float(j + 1), xs1, 0.0),
                            axis=1, keepdims=True) - 1.0
                    for j in range(caps[s])]
            outs.append(jnp.concatenate(cols, axis=1))       # [B, cap]
            cnts.append(jnp.sum(vf, axis=1, keepdims=True))
        res = jnp.concatenate(outs + cnts, axis=1)           # [B, K+npres]
        out_ref[...] = jnp.pad(res, ((0, 0), (0, kp - k_tot - npres)))

    def run(combo: Array) -> Tuple[Array, Array]:
        n = combo.shape[0]
        npad = _round_up(max(n, block_rows), block_rows)
        if npad != n:
            combo = jnp.pad(combo, ((0, npad - n), (0, 0)),
                            constant_values=-1.0)
        out = pl.pallas_call(
            kernel,
            grid=(npad // block_rows,),
            in_specs=[pl.BlockSpec((w_tot, w_tot), lambda i: (0, 0)),
                      pl.BlockSpec((block_rows, w_tot), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((block_rows, kp), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((npad, kp), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(tri_np), combo)
        packed = out[:n, :k_tot]
        counts = out[:n, k_tot:k_tot + npres]
        return packed, counts

    return run


def left_pack(combo: Array, widths: Sequence[int], caps: Sequence[int],
              interpret: Optional[bool] = None) -> Tuple[Array, Array]:
    """Left-pack valid candidate keys per species block (see
    ``make_left_pack``). Not differentiable (selection is frozen per
    refresh; indices only)."""
    fn = make_left_pack(tuple(int(w) for w in widths),
                        tuple(int(k) for k in caps), interpret)
    return fn(jax.lax.stop_gradient(combo))


# ---------------------------------------------------------------------------
# Mask-driven select path (round 4): the d2/validity phase runs in SLOT
# space (one Pallas kernel over cells, coarse window reads — no [N, 3, kk]
# per-atom candidate gather, which cost ~5 ms of the 26k select as ~700 MB
# of materialized XLA intermediates), emitting a tiny int8 validity mask.
# The rank left-pack then consumes mask rows and packs LANE indices (keys
# are a static iota — no slot-key tensor is ever materialized either).
# ---------------------------------------------------------------------------

# Stencil entry index of the cell itself in the (-1,0,1)^3 meshgrid
# enumeration shared by every window builder (pallas_window.py:56).
_SELF_ENTRY = 13


@functools.lru_cache(maxsize=32)
def make_window_mask(w2: float, cell_caps: Tuple[int, ...],
                     interpret: Optional[bool] = None,
                     out_dtype=jnp.bfloat16):
    """Build ``fn(candx, candy, candz [ncells, kk], centers [ncells, c, 3])
    -> mask [ncells, c, kk]`` marking candidate lanes within sqrt(w2) of
    each center row, self-pairs excluded.

    ``out_dtype``: bfloat16 by default (0/1 is exact; this chip's Mosaic
    rejects int8 vector compares — "Target does not support this
    comparison" — so the nominally-2x-smaller int8 mask is off the table).

    Window layout: species-major (species s owns lanes [27*off_s,
    27*(off_s+cell_caps[s])), entry-major within its block), image shifts
    already applied, empty slots at the FAR sentinel (pallas_window.py).
    Center row r of species block s self-matches at the static lane
    ``27*off_s + 13*cell_caps[s] + (r - off_s)``; empty center rows sit at
    2*FAR and fail the distance test against everything.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    cell_caps = tuple(int(x) for x in cell_caps)
    c = sum(cell_caps)
    kk = 27 * c
    npres = len(cell_caps)
    offs = np.cumsum((0,) + cell_caps)[:-1]
    wb = 27 * offs
    sp_shift = [int(wb[s] + _SELF_ENTRY * cell_caps[s] - offs[s])
                for s in range(npres)]
    # ~5 live [G, c, kk] f32 working arrays inside ~10 MB scoped VMEM.
    g_step = int(max(1, min(32, 10 * 2 ** 20 // (5 * c * kk * 4))))

    def kernel(cx_ref, cy_ref, cz_ref, ctr_ref, out_ref):
        cx = cx_ref[...]                                   # [G, 1, kk]
        cy = cy_ref[...]
        cz = cz_ref[...]
        ctr = ctr_ref[...]                                 # [G, c, 3]
        dx = cx - ctr[:, :, 0:1]
        dy = cy - ctr[:, :, 1:2]
        dz = cz - ctr[:, :, 2:3]
        d2 = dx * dx + dy * dy + dz * dz                   # [G, c, kk]
        lane = jax.lax.broadcasted_iota(jnp.int32, (c, kk), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (c, kk), 0)
        self_lane = row + sp_shift[0]
        for s in range(1, npres):
            self_lane = jnp.where(row >= int(offs[s]), row + sp_shift[s],
                                  self_lane)
        valid = (d2 < w2) & (lane != self_lane)[None]
        out_ref[...] = valid.astype(out_dtype)

    def run(candx: Array, candy: Array, candz: Array,
            centers: Array) -> Array:
        ncells = candx.shape[0]
        pad = (-ncells) % g_step
        np_ = ncells + pad

        def _mid(x):
            return x.reshape(x.shape[0], 1, x.shape[1])

        def _pad_cells(x, fill):
            if not pad:
                return x
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])

        out = pl.pallas_call(
            kernel,
            grid=(np_ // g_step,),
            in_specs=[pl.BlockSpec((g_step, 1, kk), lambda i: (i, 0, 0))] * 3
                     + [pl.BlockSpec((g_step, c, 3), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((g_step, c, kk), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((np_, c, kk), out_dtype),
            interpret=interpret,
        )(_pad_cells(_mid(candx), 1e6), _pad_cells(_mid(candy), 1e6),
          _pad_cells(_mid(candz), 1e6), _pad_cells(centers, 2e6))
        return out[:ncells]

    return run


@functools.lru_cache(maxsize=32)
def make_left_pack_lanes(widths: Tuple[int, ...], caps: Tuple[int, ...],
                         interpret: Optional[bool] = None,
                         block_rows: Optional[int] = None):
    """Build ``fn(mask [N, W]) -> (lanes [N, K], counts [N, npres])``: the
    rank left-pack of ``make_left_pack`` but keyed by the STATIC local lane
    index of each species block (no key input at all — the caller
    reconstructs slot ids arithmetically from the packed lane indices).

    ``mask``: per species block s a [N, widths[s]] slab (any integer/float
    dtype; nonzero = valid), zero-padded to 128-multiple lane widths.
    ``lanes``: per block the BLOCK-LOCAL lane indices (f32, exact — widths
    stay far below 2^24) of the first caps[s] valid lanes, -1 beyond the
    valid count.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    widths = tuple(int(w) for w in widths)
    caps = tuple(int(k) for k in caps)
    pws = tuple(_round_up(w, 128) for w in widths)
    offs = np.cumsum((0,) + pws)
    w_tot = int(offs[-1])
    k_tot = int(sum(caps))
    npres = len(widths)
    kp = _round_up(k_tot + npres, 128)

    tri_np = np.zeros((w_tot, w_tot), np.float32)
    for s in range(npres):
        a, b = int(offs[s]), int(offs[s + 1])
        tri_np[a:b, a:b] = np.tril(np.ones((b - a, b - a), np.float32)).T
    tri_np = tri_np.astype(jnp.bfloat16)

    if block_rows is None:
        budget = 12 * 2 ** 20 - 2 * w_tot * w_tot
        if budget < 64 * 6 * w_tot * 4:
            raise ValueError(
                f'left-pack lane width {w_tot} needs a '
                f'{2 * w_tot * w_tot / 2**20:.1f} MiB tri constant — too '
                'wide for scoped VMEM; use the sort-based compaction path')
        block_rows = max(64, min(512, (budget // (6 * w_tot * 4) // 64)
                                 * 64))

    def kernel(tri_ref, mask_ref, out_ref):
        m = mask_ref[...]                                   # [B, W]
        outs, cnts = [], []
        for s in range(npres):
            ms = jax.lax.slice_in_dim(m, int(offs[s]), int(offs[s + 1]),
                                      axis=1)               # [B, pw]
            # The mask carries exact 0/1 values: a straight convert (no
            # compare — Mosaic rejects sub-32-bit vector compares here).
            vf = ms.astype(jnp.float32)
            tril = tri_ref[int(offs[s]):int(offs[s + 1]),
                           int(offs[s]):int(offs[s + 1])]
            rank = jax.lax.dot_general(
                vf.astype(jnp.bfloat16), tril,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [B, pw]
            rank = rank + (1.0 - vf) * 65536.0
            pw = int(offs[s + 1] - offs[s])
            # Mosaic iota must be integer; convert for the f32 extraction.
            lane1 = jax.lax.broadcasted_iota(
                jnp.int32, (1, pw), 1).astype(jnp.float32) + 1.0
            cols = [jnp.sum(jnp.where(rank == float(j + 1), lane1, 0.0),
                            axis=1, keepdims=True) - 1.0
                    for j in range(caps[s])]
            outs.append(jnp.concatenate(cols, axis=1))       # [B, cap]
            cnts.append(jnp.sum(vf, axis=1, keepdims=True))
        res = jnp.concatenate(outs + cnts, axis=1)           # [B, K+npres]
        out_ref[...] = jnp.pad(res, ((0, 0), (0, kp - k_tot - npres)))

    def run(mask: Array) -> Tuple[Array, Array]:
        n = mask.shape[0]
        npad = _round_up(max(n, block_rows), block_rows)
        if npad != n:
            mask = jnp.pad(mask, ((0, npad - n), (0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(npad // block_rows,),
            in_specs=[pl.BlockSpec((w_tot, w_tot), lambda i: (0, 0)),
                      pl.BlockSpec((block_rows, w_tot), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((block_rows, kp), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((npad, kp), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(tri_np), mask)
        packed = out[:n, :k_tot]
        counts = out[:n, k_tot:k_tot + npres]
        return packed, counts

    return run
