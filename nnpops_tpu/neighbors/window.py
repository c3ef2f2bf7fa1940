"""Window-mode neighbor pipeline: dense per-cell radial + compacted angular.

The third-generation AEV data path (after round-1 one-hot payloads and the
species-blocked lanes of ``neighbors.blocked``):

* the RADIAL AEV needs no per-atom neighbor list at all — it is computed by
  the fused per-cell window kernel (``ops.pallas_window``) over the dense
  27-cell candidate window, built with coarse cell-granularity copies.
  This kills the largest single cost of the blocked path at production
  sizes: the latency-bound [N, K_rad]-row payload gather and its
  mirror-list adjoint (~23 ms of a 37 ms step at 26k atoms);
* cell slots are SPECIES-SUB-BLOCKED (species i holds slot ranks
  [sum(cell_caps[:i]), sum(cell_caps[:i+1])) of its cell) and the window
  is species-major, so the kernel's per-species reductions are contiguous
  lane slices — no species masks, no win_sp table at all;
* the ANGULAR AEV keeps compacted per-atom lanes (its triple enumeration
  needs them), but the per-step gather now fetches ONLY the angular window
  (~3x fewer rows than the radial list, neighbor counts scale with r^3).
  The compaction (``_compact_window``) exploits the static lane species of
  species-major windows: one sort per species over its own lane slice and
  slice-sum true counts; the payload/Pallas kernels are the battle-tested
  blocked-path components.

Frozen-wrap contract: positions are wrapped into the primary box with the
box-multiple recorded AT REFRESH TIME (``wrap_shift``), so a slot's
position stays continuous near its frozen cell even if the atom drifts
across the periodic boundary between refreshes; candidate windows add the
frozen per-(cell, stencil-offset) image shifts instead of per-pair
minimum-image rounding. Validity is the standard Verlet-skin argument:
build the cell list with ``cutoff = radial_cutoff + skin`` and refresh the
selection before any atom moves more than skin/2.

Reference parity: the radial/angular math matches
CpuANISymmetryFunctions.cpp:99-109/:141-147/:183-190; the soft-failure
capacity contract follows getNeighborPairs.py:77-83 (per-(cell, species)
occupancy and angular lane counts are the only capacities left — the
window radial is otherwise capacity-free).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import box_transform
from ..ops.pallas_window import FAR, window_radial_aev
from .blocked import (BlockedLayout, BlockedSelection, _build_mirror,
                      payload_from_blocked)
from .cell_list import CellList, _perpendicular_widths

Array = jnp.ndarray

# How _make_tier_geometry's adjoint applies the packed-space mirror
# permutation to lane cotangents: 'gather' (per-row HBM gather) or 'sort'
# (one single-key 4-array lax.sort; dense passes instead of the per-row
# latency wall). Module-level so an A/B probe can flip it before tracing.
# 'sort' measured 22.57 -> 20.87 ms/step on the 26k frozen step
# (probe_mirror, NOTES_PERF round-4) with bit-parity forces.
MIRROR_IMPL = 'sort'

# How _make_stencil_window materializes the 27-cell window: 'roll' (27
# periodic jnp.rolls — dense slice-concats in both directions, roll's
# transpose being the opposite roll) or 'gather' (the original [ncells, 27]
# row gather with a gather-based custom adjoint). Module-level so an A/B
# probe can flip it before tracing.
STENCIL_IMPL = 'roll'


class AngTier(NamedTuple):
    """Frozen angular row-tier bundle (see select_window): rows sorted by
    ascending tier id within each species block; tier-0 rows gather all
    angular lanes, tier-t rows only the leading ang_tier_caps[t-1] lanes
    per species block. Mirror indices are pre-translated into the packed
    tier-major flat space ([tier0 rows x K0 | tier1 rows x K1 | ...]) so
    the joint gather's adjoint stays a frozen gather."""
    row_order: Array       # [N] tiered row -> (angular-grid) sorted index
    row_atom: Array        # [N] tiered row -> original atom index
    idx: Tuple[Array, ...]        # per tier [R_t, K_t] neighbor slot ids
    mask: Tuple[Array, ...]       # per tier [R_t, K_t]
    mir: Tuple[Array, ...]        # per tier [R_t, K_t] packed-space mirror
    slot_rows: Tuple[Array, ...]  # per tier [R_t]
    # [ntiers-1, npres] true CUMULATIVE row counts of tiers 0..t (soft
    # failure when one exceeds the planned cumulative row capacity).
    tier_counts: Array
    concat_pos: Array      # [N] tiered row -> packed tier-major position
    row_of_atom: Array     # [N] original atom index -> tiered row
    crow_of_atom: Array    # [N] original atom index -> packed row
    inv_concat_pos: Array  # [N] packed row -> tiered row (static)


class WindowSelection(NamedTuple):
    """Frozen window-mode selection (refresh-scoped, like BlockedSelection).

    ``ang``: a BlockedSelection whose "radial" lanes ARE the angular window
    (``rad_caps == ang_caps``), including the mirror list for the angular
    payload gather's adjoint. Its slot space is the ANGULAR grid
    (``layout.ang_cell_grid``/``ang_cell_caps``) when one is planned, else
    the radial grid.

    ``rad_*``: the radial grid's slot assignment (aliases of the ``ang``
    fields in single-grid mode).
    """
    ang: BlockedSelection
    shift_planes: Array    # [3, ncells, kk] radial-grid image shifts
    #                        (dummy [1,1,1] unless need_shift_planes)
    wrap_shift: Array      # [N, 3] frozen box wrap per atom
    max_cell_sp: Array     # [npres] true max per-(cell, species) occupancy
    # Cell-occupancy bucketing (frozen per refresh): cells permuted so the
    # (at most num_big_cells) high-occupancy cells come first; identity
    # permutation when bucketing is disabled.
    cell_perm: Array       # [ncells] int32
    n_big_true: Array      # scalar int32 — true big-cell count
    # Radial-grid slot assignment (== the ang fields in single-grid mode).
    rad_order: Array           # [N] sorted row -> atom
    rad_slot_of_sorted: Array  # [N]
    rad_slot_of_atom: Array    # [N] atom -> radial slot id
    max_cell_sp_ang: Array     # [npres] angular-grid occupancy max
    # Angular row tiering (None when disabled or no grouping_order given).
    tier: Optional[AngTier] = None
    # Cluster-pair radial selection (radial_impl='cluster' only).
    clusters: Optional[object] = None
    # Inverse radial-slot maps (gather-only adjoints in window_features).
    rad_slot_to_atom: Optional[Array] = None   # [cc] slot -> atom (N = empty)
    rad_slot_to_row: Optional[Array] = None    # [cc] slot -> tier row (N = empty)


def plan_window_cells(positions, box, species, present,
                      cutoff: float, margin: float = 1.15,
                      pad_multiple: int = 8):
    """Host-side planner: (cell_grid, cell_caps, small_caps, num_big_cells)
    for species-sub-blocked window slots, or all-None when the box is under
    3 cells wide (window mode impossible).

    ``pad_multiple``: sublane alignment of the total cell block — 8 for
    grids that feed the radial Pallas kernels, 1 for the dedicated angular
    candidate grid (whose slots never form a kernel row dimension).

    ``small_caps``/``num_big_cells`` implement cell-occupancy bucketing:
    most cells sit near the MEAN occupancy while capacities must hold the
    MAX, so the radial kernel runs sparse cells with packed center rows
    (~35% fewer row slots at water density). Cells exceeding small_caps go
    to the big class — at most num_big_cells of them (observed count x1.5
    headroom; beyond it is a reported soft failure like every other
    capacity)."""
    box_np = np.asarray(box, np.float64)
    widths = _perpendicular_widths(box_np)
    nc = np.maximum(np.floor(widths / cutoff).astype(int), 1)
    if (nc < 3).any():
        return None, None, None, None
    nx, ny, nz = (int(x) for x in nc)
    ncells = nx * ny * nz
    inv = np.linalg.inv(box_np)
    frac = np.asarray(positions, np.float64) @ inv
    frac -= np.floor(frac)
    c3 = np.minimum((frac * nc).astype(int), nc - 1)
    cid = (c3[:, 0] * ny + c3[:, 1]) * nz + c3[:, 2]
    species = np.asarray(species)
    pres_index = {s: i for i, s in enumerate(present)}
    sp_idx = np.array([pres_index[int(s)] for s in species])
    npres = len(present)
    counts = np.bincount(cid * npres + sp_idx,
                         minlength=ncells * npres).reshape(ncells, npres)
    caps = [int(np.ceil(m * margin)) + 1 for m in counts.max(axis=0)]
    pad = (-sum(caps)) % pad_multiple   # sublane-align the cell block
    caps[-1] += pad
    caps = tuple(caps)

    # Pick the small-class capacities minimizing the kernel's expected
    # center rows (VPU rows pad to 8-multiples internally, so evaluate the
    # padded size): big cells run at full caps, the rest at small caps.
    c_full = -(-sum(caps) // 8) * 8
    best = (c_full, None, None)
    for pct in (50, 60, 70, 80, 90):
        small = tuple(
            min(int(np.ceil(np.percentile(counts[:, s], pct))) + 1, caps[s])
            for s in range(npres))
        frac_big = float((counts > np.asarray(small)).any(axis=1).mean())
        c_small = -(-sum(small) // 8) * 8
        cost = frac_big * c_full + (1.0 - frac_big) * c_small
        if cost < best[0] - 0.5:
            best = (cost, small, frac_big)
    _, small, frac_big = best
    if small is None:
        return (nx, ny, nz), caps, None, None   # bucketing not worth it
    n_big = int(np.ceil(frac_big * ncells * 1.5)) + 8
    n_big = min(-(-n_big // 8) * 8, ncells)
    if n_big >= ncells * 3 // 5:
        return (nx, ny, nz), caps, None, None
    return (nx, ny, nz), caps, small, n_big


def _num_triples(caps) -> int:
    """Triple-table size for per-species angular capacities (same
    enumeration as aev_blocked.build_triple_tables)."""
    t = 0
    for i, ci in enumerate(caps):
        t += ci * (ci - 1) // 2
        for cj in caps[i + 1:]:
            t += ci * cj
    return t


def plan_angular_tiers(positions, box, species, present, ang_window: float,
                       ang_caps: Tuple[int, ...]):
    """Host-side planner for angular row tiering: (ang_tier_caps,
    ang_tier_rows) or (None, None) when a split doesn't pay.

    The angular kernel's cost is rows x triple-table size; capacities hold
    the MAX per-species neighbor count while typical rows sit near the
    mean, so the full table wastes ~5x. Rows fitting a smaller capacity
    run against a (quadratically smaller) table; the planner searches
    two- AND three-tier cap ladders (nested percentile caps) minimizing
    the expected sum of rows x triples over tiers."""
    positions = np.asarray(positions, np.float64)
    species = np.asarray(species)
    n = len(positions)
    npres = len(present)
    pres_index = {s: i for i, s in enumerate(present)}
    sp_idx = np.array([pres_index[int(s)] for s in species])
    box_np = np.asarray(box, np.float64) if box is not None else None
    # Cell-binned per-atom per-species neighbor counts within ang_window.
    counts = np.zeros((n, npres), np.int64)
    w2 = float(ang_window) ** 2
    if box_np is not None:
        widths = _perpendicular_widths(box_np)
        nc = np.maximum((widths // ang_window).astype(int), 1)
        if (nc < 3).any():
            nc = np.array([1, 1, 1])
    else:
        nc = np.array([1, 1, 1])
    ncell = int(np.prod(nc))
    if ncell == 1:
        cells = {0: np.arange(n)}
        stencil = {0: [0]}
    else:
        inv = np.linalg.inv(box_np)
        frac = positions @ inv
        frac -= np.floor(frac)
        c3 = np.minimum((frac * nc).astype(int), nc - 1)
        cid = (c3[:, 0] * nc[1] + c3[:, 1]) * nc[2] + c3[:, 2]
        order = np.argsort(cid, kind='stable')
        bounds = np.searchsorted(cid[order], np.arange(ncell + 1))
        cells = {c: order[bounds[c]:bounds[c + 1]] for c in range(ncell)}
        stencil = {}
        for c in range(ncell):
            cz = c % nc[2]
            cy = (c // nc[2]) % nc[1]
            cx = c // (nc[1] * nc[2])
            ids = set()
            for ox in (-1, 0, 1):
                for oy in (-1, 0, 1):
                    for oz in (-1, 0, 1):
                        ids.add((((cx + ox) % nc[0]) * nc[1]
                                 + (cy + oy) % nc[1]) * nc[2]
                                + (cz + oz) % nc[2])
            stencil[c] = sorted(ids)
    for c, atoms in cells.items():
        if len(atoms) == 0:
            continue
        cand = np.concatenate([cells[q] for q in stencil[c]])
        delta = positions[cand][None, :, :] - positions[atoms][:, None, :]
        if box_np is not None:
            delta = delta - np.round(delta[..., 2:3] / box_np[2, 2]) * box_np[2]
            delta = delta - np.round(delta[..., 1:2] / box_np[1, 1]) * box_np[1]
            delta = delta - np.round(delta[..., 0:1] / box_np[0, 0]) * box_np[0]
        d2 = (delta ** 2).sum(-1)
        d2[atoms[:, None] == cand[None, :]] = np.inf
        within = d2 < w2
        for s in range(npres):
            counts[atoms, s] = within[:, sp_idx[cand] == s].sum(1)

    def _padded_triples(caps_t):
        # The kernel's [B, Tp] arrays lane-pad to 128 multiples in VMEM, so
        # the real per-row cost steps at 128-triple boundaries (T=276 costs
        # the same as T=384); the planner must minimize rows x PADDED size
        # or it picks caps whose extra triples are free to drop but whose
        # padding is not (measured 39% pad on a 276-triple tier at 26k).
        return -(-max(_num_triples(caps_t), 1) // 128) * 128

    t_full = _padded_triples(ang_caps)
    pcts = (40, 50, 60, 70, 80, 90)

    def _grow_to_pad(caps_t):
        # Bump caps while the 128-padded triple count is unchanged: the
        # extra lanes are free (they live in the pad) and let MORE rows
        # fit this tier instead of a bigger one.
        caps_l = list(caps_t)
        padded = _padded_triples(tuple(caps_l))
        improved = True
        while improved:
            improved = False
            for s in range(npres):
                if caps_l[s] < ang_caps[s]:
                    trial = list(caps_l)
                    trial[s] += 1
                    if _padded_triples(tuple(trial)) == padded:
                        caps_l = trial
                        improved = True
        return tuple(caps_l)

    def caps_at(pct):
        return _grow_to_pad(tuple(
            min(int(np.ceil(np.percentile(counts[:, s], pct))) + 1,
                ang_caps[s]) for s in range(npres)))

    def fits(caps_t):
        return (counts <= np.asarray(caps_t)).all(axis=1)

    # Search nested percentile cap ladders of depth 1..3 (2..4 tiers
    # total): rows run the smallest tier whose caps hold their counts, so
    # the expected cost is sum over tiers of (fraction in tier) x (tier
    # triple-table size). Each extra tier must beat the incumbent by 5%
    # (tiers are not free: one more kernel launch + row segment).
    from itertools import combinations
    best = (float(t_full), None)
    for depth in (1, 2, 3):
        for ps in combinations(sorted(pcts), depth):
            capsl = [caps_at(p) for p in sorted(ps, reverse=True)]
            prev, ok = ang_caps, True
            for ct in capsl:                     # strictly nested ladder
                if ct == prev or any(a > b for a, b in zip(ct, prev)):
                    ok = False
                    break
                prev = ct
            if not ok:
                continue
            fs_l = [float(fits(ct).mean()) for ct in capsl]
            cost = (1.0 - fs_l[0]) * t_full
            for i in range(depth):
                frac = (fs_l[i] - fs_l[i + 1]) if i + 1 < depth else fs_l[i]
                cost += frac * _padded_triples(capsl[i])
            if cost < best[0] * 0.95:
                best = (cost, tuple(capsl))
    _, tiers = best
    if tiers is None:
        return None, None
    caps_all = (ang_caps,) + tiers
    ntiers = len(caps_all)
    t_of = np.zeros(n, np.int64)
    for t in range(1, ntiers):
        t_of += fits(caps_all[t]).astype(np.int64)
    # Planned static row capacities for tiers 0..ntiers-2 (the last tier
    # takes the remainder), 1.5x-headroomed and cumulative-clamped so the
    # remainder is never negative.
    sp_counts = np.array([(sp_idx == i).sum() for i in range(npres)])
    tier_rows = []
    cum = np.zeros(npres, np.int64)
    for t in range(ntiers - 1):
        rows_t = []
        for i in range(npres):
            cnt = int(((t_of == t) & (sp_idx == i)).sum())
            cap = min(int(np.ceil(cnt * 1.5)) + 8,
                      int(sp_counts[i] - cum[i]))
            rows_t.append(cap)
        cum += np.asarray(rows_t)
        tier_rows.append(tuple(rows_t))
    # Drop trailing tiers the planned rows already exhaust (tiny systems).
    while tiers and int((sp_counts - cum).sum()) == 0:
        cum -= np.asarray(tier_rows[-1])
        tiers = tiers[:-1]
        tier_rows = tier_rows[:-1]
    if not tiers:
        return None, None
    return tiers, tuple(tier_rows)


@functools.lru_cache(maxsize=16)
def _window_tables(ncells3: Tuple[int, int, int]) -> Tuple[np.ndarray, ...]:
    """Static per-cell-grid tables: wrap factors [ncells, 27, 3], the
    stencil [ncells, 27], and the reverse flat index for the window adjoint
    [ncells, 27]."""
    nx, ny, nz = ncells3
    cx, cy, cz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing='ij')
    coords = np.stack([cx.ravel(), cy.ravel(), cz.ravel()], -1)
    offs = np.array(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                indexing='ij')).reshape(3, 27).T
    tot = coords[:, None, :] + offs[None, :, :]                 # [cells,27,3]
    n3 = np.array([nx, ny, nz])
    f27 = np.floor_divide(tot, n3).astype(np.float32)
    wrapped = np.mod(tot, n3)
    stencil = ((wrapped[:, :, 0] * ny + wrapped[:, :, 1]) * nz
               + wrapped[:, :, 2]).astype(np.int32)
    # Window-adjoint source: cell b receives, as its i-th contribution, the
    # cotangent that cell a = b - off_i produced at window entry i; offsets
    # enumerate symmetrically so a = stencil[b, 26 - i]. Flattened into
    # [ncells*27] row ids of the [ncells, 27, c]-shaped cotangent.
    ii = np.arange(27)
    rev_flat = (stencil[:, ::-1] * 27 + ii[None, :]).astype(np.int32)
    return f27, stencil, rev_flat


@functools.lru_cache(maxsize=32)
def _tier_rows_static(present_counts: Tuple[int, ...],
                      planned: Tuple[Tuple[int, ...], ...]):
    """Per-tier per-species static row counts: planned capacities for
    tiers 0..T-2, the remainder for the last tier."""
    tier_rows = [tuple(int(x) for x in p) for p in planned]
    tier_rows.append(tuple(
        int(cnt) - sum(tr[i] for tr in tier_rows)
        for i, cnt in enumerate(present_counts)))
    return tuple(tier_rows)   # immutable: the result is lru_cache'd


def _tier_static(present_counts: Tuple[int, ...],
                 tier_rows: Tuple[Tuple[int, ...], ...]):
    """Static tier-row-space tables (see AngTier): rows are species blocks
    (sizes present_counts), each split into consecutive per-tier segments
    of sizes tier_rows[t][i]. Returns (tier_tot, concat_pos) where
    concat_pos maps a tiered row to its position in the packed tier-major
    concatenation [all tier-0 rows | all tier-1 rows | ...]."""
    starts = np.cumsum((0,) + present_counts)[:-1]
    ntiers = len(tier_rows)
    tier_tot = [int(sum(tr)) for tr in tier_rows]
    tier_base = np.cumsum([0] + tier_tot)
    cum_sp = [np.cumsum((0,) + tuple(tr))[:-1] for tr in tier_rows]
    concat_pos = np.empty(sum(present_counts), np.int32)
    for i, st in enumerate(starts):
        off = st
        for t in range(ntiers):
            r = tier_rows[t][i]
            concat_pos[off:off + r] = (tier_base[t] + cum_sp[t][i]
                                       + np.arange(r))
            off += r
    return tier_tot, concat_pos


def _mirror_packed(segments, cc: int,
                   grid3: Optional[Tuple[int, int, int]] = None,
                   c_per_cell: Optional[int] = None):
    """Mirror indices built DIRECTLY in the packed tier-major flat space
    ([tier-0 rows x K0 | tier-1 rows x K1 | ...]). ``segments``: per tier
    (slot_rows [R_t], idx [R_t, K_t], mask [R_t, K_t]).

    With ``grid3``/``c_per_cell`` (the slot space's cell grid and slots per
    cell) the pairing runs as TWO single-key sorts (round 4): each directed
    entry's key is re-encoded with the neighbor RELATIVE to the center's
    stencil (slot * 27c + entry * c + slot_offset, < cc * 27c — fits i32
    where the naive slot-pair key cc^2 does not), the canonical unordered
    key q = min(forward, reverse) is computed ARITHMETICALLY (the reverse
    stencil entry is 26 - e by the symmetric (-1,0,1)^3 enumeration,
    ``_window_tables``), and one sort by q lands the two directions of
    every pair ADJACENT — partner = neighbor element in the sorted order,
    inverted back to entry order by a second key-value sort. The round-3
    version needed two 2-key 3-array sorts plus a third inversion sort
    (~3x the sort work) because the slot-PAIR key overflows 32 bits at
    production slot counts. Without grid info the old path is used.

    Pairing correctness: each valid directed entry (i -> j) has its
    reverse (j -> i) present in the packed space — a tier-t row's valid
    lanes all sit inside its leading tier-t-cap lanes by the tier
    definition. Rows pushed past a planned tier capacity lose lanes and
    break pairing; that is the ``tier_counts`` soft failure (results
    already invalid)."""
    shapes = [idx.shape for _, idx, _ in segments]
    sizes = [r * k for r, k in shapes]
    tot = sum(sizes)
    s1 = jnp.concatenate([
        jnp.broadcast_to(sr[:, None], idx.shape).reshape(-1)
        for sr, idx, _ in segments])
    s2 = jnp.concatenate([idx.reshape(-1) for _, idx, _ in segments])
    valid = jnp.concatenate([m.reshape(-1) for _, _, m in segments])
    valid = valid & (s1 <= cc)
    flat = jnp.arange(tot, dtype=jnp.int32)
    use_rel = (grid3 is not None and c_per_cell is not None
               and cc * 27 * c_per_cell < 2 ** 31 - 1)
    if use_rel:
        nx, ny, nz = (int(x) for x in grid3)
        c = int(c_per_cell)
        kk = 27 * c
        s1c = jnp.minimum(s1, cc - 1)      # clamp sentinels (masked anyway)
        s2c = jnp.minimum(s2, cc - 1)
        c1 = s1c // c
        c2 = s2c // c
        so1 = s1c - c1 * c
        so2 = s2c - c2 * c

        def _axis_off(a1, a2, na):
            d = (a2 - a1 + 1) % na          # 0 -> -1, 1 -> 0, 2 -> +1
            return jnp.where(d > 2, 1, d)   # na-1 aliases never occur (na>=3)

        x1, x2 = c1 // (ny * nz), c2 // (ny * nz)
        y1, y2 = (c1 // nz) % ny, (c2 // nz) % ny
        z1, z2 = c1 % nz, c2 % nz
        e = (_axis_off(x1, x2, nx) * 9 + _axis_off(y1, y2, ny) * 3
             + _axis_off(z1, z2, nz))       # stencil entry of s2 in s1's win
        p1 = s1c * kk + e * c + so2
        p2 = s2c * kk + (26 - e) * c + so1
        q = jnp.minimum(p1, p2)
        big = jnp.int32(2 ** 31 - 1)
        pad = tot % 2                       # adjacent-pair trick needs even
        qv = jnp.where(valid, q, big)
        fl = flat
        if pad:
            qv = jnp.concatenate([qv, jnp.full((1,), big, qv.dtype)])
            fl = jnp.concatenate([fl, jnp.full((1,), tot, jnp.int32)])
        _, fs = jax.lax.sort([qv, fl], num_keys=1)
        partner = fs.reshape(-1, 2)[:, ::-1].reshape(-1)
        # Invert: mir[fs[k]] = partner[k]; fs is a permutation, so a
        # key-value sort by fs IS the scatter (dense passes vs per-row
        # scatter latency).
        _, mir = jax.lax.sort([fs, partner], num_keys=1)
        mir = mir[:tot]
        mir = jnp.where(valid, jnp.minimum(mir, tot), tot)
    else:
        base = cc + 2
        if base * base < 2 ** 32:
            p1 = (s1.astype(jnp.uint32) * np.uint32(base)
                  + s2.astype(jnp.uint32))
            p2 = (s2.astype(jnp.uint32) * np.uint32(base)
                  + s1.astype(jnp.uint32))
            bigk = jnp.uint32(2 ** 32 - 1)
            _, v1 = jax.lax.sort([jnp.where(valid, p1, bigk), flat],
                                 num_keys=1)
            _, v2 = jax.lax.sort([jnp.where(valid, p2, bigk), flat],
                                 num_keys=1)
        else:
            bigk = jnp.int32(base)
            _, _, v1 = jax.lax.sort([jnp.where(valid, s1, bigk),
                                     jnp.where(valid, s2, bigk), flat],
                                    num_keys=2)
            _, _, v2 = jax.lax.sort([jnp.where(valid, s2, bigk),
                                     jnp.where(valid, s1, bigk), flat],
                                    num_keys=2)
        # mir[v1[k]] = v2[k]; v1 is a full permutation of [0, tot) (valid
        # ranks first, then the invalid tail in arbitrary order), so a third
        # key-value sort by v1 IS the scatter — a ~tot-element scatter costs
        # gather-like per-row latency (~4.5 ns/row measured) while a sort
        # pass is dense.
        _, mir = jax.lax.sort([v1, v2], num_keys=1)
        mir = jnp.where(valid, mir, tot)
    out, off = [], 0
    for (r, k), sz in zip(shapes, sizes):
        out.append(jax.lax.slice_in_dim(mir, off, off + sz,
                                        axis=0).reshape(r, k))
        off += sz
    return tuple(out)


def _build_tier_packed(nbr: Array, mask: Array, counts: Array, slot32: Array,
                       inv_order: Array, grouping_order: np.ndarray,
                       present_counts: Tuple[int, ...],
                       layout: BlockedLayout, cc: int,
                       grid3: Optional[Tuple[int, int, int]] = None,
                       c_per_cell: Optional[int] = None) -> AngTier:
    """Traced per-refresh tier construction (see AngTier docstring).

    Works entirely with ROW permutations + static slices: rows are permuted
    to tier order FIRST and the mirror is then built directly in the packed
    flat space (``_mirror_packed``) — the previous design built the mirror
    full-width and translated it with four ~N*Kat-element table-lookup
    gathers, which at the measured ~4-5 ns/row gather latency cost ~20 ms
    of the 26k select (NOTES_PERF.md round-2 session 5).
    """
    a_caps = layout.ang_caps
    caps_all = (a_caps,) + tuple(layout.ang_tier_caps)
    ntiers = len(caps_all)
    ang_offs = np.cumsum((0,) + a_caps)[:-1]
    tier_rows = _tier_rows_static(present_counts, layout.ang_tier_rows)
    _, concat_pos_np = _tier_static(present_counts, tier_rows)
    # Species-block-relative cumulative row offsets of each tier segment.
    cum_rows = np.zeros((ntiers + 1, len(present_counts)), np.int64)
    for t in range(ntiers):
        cum_rows[t + 1] = cum_rows[t] + np.asarray(tier_rows[t])

    # Tier id per sorted row: the smallest-capacity tier that holds the
    # per-species counts (caps are nested, so fits are monotone).
    t_of = jnp.zeros(counts.shape[0], jnp.int32)
    for ct in caps_all[1:]:
        ca = jnp.asarray(np.asarray(ct, np.int32))
        t_of += jnp.all(counts <= ca[None, :], axis=1).astype(jnp.int32)
    io_g = inv_order[jnp.asarray(np.asarray(grouping_order, np.int32))]
    tk = t_of[io_g]
    starts = np.cumsum((0,) + present_counts)[:-1]
    parts, cum_counts = [], []
    for st, cnt in zip(starts, present_counts):
        b = jax.lax.slice_in_dim(tk, int(st), int(st) + cnt, axis=0)
        parts.append(int(st)
                     + jnp.argsort(b, stable=True).astype(jnp.int32))
        cum_counts.append(jnp.stack(
            [jnp.sum((b <= q).astype(jnp.int32))
             for q in range(ntiers - 1)]))
    tier_counts = jnp.stack(cum_counts, axis=1)        # [ntiers-1, npres]
    perm = jnp.concatenate(parts)
    io_t = io_g[perm]                                  # tiered row -> sorted
    row_atom = jnp.asarray(np.asarray(grouping_order, np.int32))[perm]
    nbr_t = nbr[io_t]
    mask_t = mask[io_t]
    srows_t = slot32[io_t]

    def split_rows(x):
        return [jnp.concatenate(
            [jax.lax.slice_in_dim(x, int(st + cum_rows[t][i]),
                                  int(st + cum_rows[t + 1][i]), axis=0)
             for i, st in enumerate(starts)], 0) for t in range(ntiers)]

    nbr_tiers = split_rows(nbr_t)
    mask_tiers = split_rows(mask_t)
    srows_tiers = split_rows(srows_t)

    def tier_lanes(x, caps_t):
        return jnp.concatenate(
            [jax.lax.slice_in_dim(x, int(ao), int(ao) + sc, axis=1)
             for ao, sc in zip(ang_offs, caps_t)], axis=1)

    idx_tiers = [nbr_tiers[0]] + [tier_lanes(nbr_tiers[t], caps_all[t])
                                  for t in range(1, ntiers)]
    msk_tiers = [mask_tiers[0]] + [tier_lanes(mask_tiers[t], caps_all[t])
                                   for t in range(1, ntiers)]
    mirs = _mirror_packed(
        [(srows_tiers[t], idx_tiers[t], msk_tiers[t])
         for t in range(ntiers)], cc, grid3=grid3, c_per_cell=c_per_cell)
    # Inverse row maps (per refresh): they turn every per-step adjoint of
    # the tier pipeline into a gather (atom -> its unique tier/concat row).
    n = row_atom.shape[0]
    idx_n = jnp.arange(n, dtype=jnp.int32)
    row_of_atom = jnp.zeros((n,), jnp.int32).at[row_atom].set(idx_n)
    inv_concat_np = np.empty(len(concat_pos_np), np.int32)
    inv_concat_np[concat_pos_np] = np.arange(len(concat_pos_np), dtype=np.int32)
    crow_of_atom = jnp.zeros((n,), jnp.int32).at[row_atom].set(
        jnp.asarray(concat_pos_np))
    return AngTier(
        row_order=io_t, row_atom=row_atom,
        idx=tuple(idx_tiers), mask=tuple(msk_tiers),
        mir=tuple(mirs), slot_rows=tuple(srows_tiers),
        tier_counts=tier_counts,
        concat_pos=jnp.asarray(concat_pos_np),
        row_of_atom=row_of_atom, crow_of_atom=crow_of_atom,
        inv_concat_pos=jnp.asarray(inv_concat_np))


@jax.custom_vjp
def _tiered_gather(slots, idx, mir, mask, srows):
    """Joint N-tier slot gather (tuple args, one array per tier) whose
    adjoint is a frozen gather through the packed-space mirror (entries
    mirror across tiers, so the VJP must see all cotangents at once)."""
    return tuple(
        slots[ix.reshape(-1)].reshape(ix.shape + (3,)).transpose(2, 0, 1)
        for ix in idx)


def _tiered_gather_fwd(slots, idx, mir, mask, srows):
    out = _tiered_gather(slots, idx, mir, mask, srows)
    return out, (tuple(ix.shape for ix in idx), mir, mask, srows,
                 slots.shape[0])


def _tiered_gather_bwd(res, g):
    shapes, mir, mask, srows, n_slots = res
    flat = jnp.concatenate(
        [gt.transpose(1, 2, 0).reshape(r * k, 3)
         for gt, (r, k) in zip(g, shapes)]
        + [jnp.zeros((1, 3), g[0].dtype)], axis=0)
    d_slots = jnp.zeros((n_slots, 3), g[0].dtype)
    for (r, k), mr, ms, sr in zip(shapes, mir, mask, srows):
        gm = flat[mr.reshape(-1)].reshape(r, k, 3).transpose(2, 0, 1)
        gm = jnp.where(ms[None], gm, 0.0)
        d_slots = d_slots.at[sr].set(jnp.sum(gm, axis=2).T, mode='drop')
    return (d_slots,) + (None,) * 4


_tiered_gather.defvjp(_tiered_gather_fwd, _tiered_gather_bwd)


@functools.lru_cache(maxsize=32)
def _make_tier_geometry(cc: int, mirror_impl: str = 'gather'):
    """Joint tier geometry (neighbor gathers + center rows) with an
    all-gather adjoint.

    ``mirror_impl``: how the adjoint applies the packed-space mirror
    permutation to the lane cotangents.

    * 'gather' — per-row HBM gather ``flat[mir]`` (narrow 3-float rows at
      the measured ~4.5 ns/row latency wall).
    * 'sort' — ONE single-key 4-array ``lax.sort``: the mirror restricted
      to valid entries is an involution (partners swap), so closing it to
      a full permutation (invalid entries -> self) makes sort-by-mir
      exactly the permutation apply — sorted position q receives
      ``flat[mir[q]]``. Sort passes are dense (bandwidth-bound), not
      per-row latency-bound. Masked lanes receive their own cotangent and
      are zeroed by the existing mask select.

    Soft-failure caveat: under angular-grid slot overflow the forward's
    last-writer-wins slot fill makes VALUES invalid, and this hand-written
    adjoint routes each row's center cotangent to the row's own atom rather
    than the last writer — so GRADIENTS diverge from the actual forward
    compute too. Both are covered by the same contract: results from a step
    whose ``check_overflow`` reports a capacity breach must be discarded.
    Additionally, in that regime the two adjoint impls diverge from EACH
    OTHER: when a valid entry pairs with an invalid/pad entry (or the valid
    count is odd) the closed mirror key has duplicates and is no longer a
    permutation, so 'sort' places the duplicate-key cotangents arbitrarily
    while 'gather' routes a zero via the appended zeros row — an A/B
    between the impls is only meaningful on overflow-free steps.

    The naive composition (positions -> sorted gather -> slot scatter ->
    tier gathers / center gathers) pays three scatter-adds in its VJP at
    the measured ~5x-a-gather scatter cost. But every pair cotangent is a
    per-tier-ROW quantity and ``row_atom`` is a full permutation of the
    atoms, so the whole adjoint collapses to: mirror gathers (neighbor
    side, as in ``_tiered_gather``) + row sums + ONE [N]-row gather
    through the frozen atom->concat-row map."""

    @jax.custom_vjp
    def tier_geometry(p, order, slot_of_sorted, idx, mask, srows, mir,
                      crow_of_atom):
        pos_sorted = p[order]
        slots = jnp.zeros((cc + 2, 3), p.dtype)
        slots = slots.at[slot_of_sorted].set(pos_sorted, mode='drop')
        outs = tuple(
            slots[ix.reshape(-1)].reshape(ix.shape + (3,)).transpose(
                2, 0, 1) for ix in idx)
        ctrs = tuple(slots[jnp.minimum(sr, cc + 1)] for sr in srows)
        return outs, ctrs

    def _fwd(p, order, slot_of_sorted, idx, mask, srows, mir,
             crow_of_atom):
        out = tier_geometry(p, order, slot_of_sorted, idx, mask, srows,
                            mir, crow_of_atom)
        return out, (tuple(ix.shape for ix in idx), mask, mir,
                     crow_of_atom)

    def _bwd(res, g):
        shapes, mask, mir, crow = res
        g_outs, g_ctrs = g
        if mirror_impl == 'sort':
            sizes = [r * k for r, k in shapes]
            tot = sum(sizes)
            key = jnp.concatenate([mr.reshape(-1) for mr in mir])
            msk = jnp.concatenate([ms.reshape(-1) for ms in mask])
            idx = jnp.arange(tot, dtype=jnp.int32)
            # Close the mirror to a full involution: invalid entries map to
            # themselves (their cotangent is masked out below anyway).
            key = jnp.where(msk & (key < tot), key, idx)
            fx = jnp.concatenate([gt[0].reshape(-1) for gt in g_outs])
            fy = jnp.concatenate([gt[1].reshape(-1) for gt in g_outs])
            fz = jnp.concatenate([gt[2].reshape(-1) for gt in g_outs])
            _, gx, gy, gz = jax.lax.sort([key, fx, fy, fz], num_keys=1)
            rows, off = [], 0
            for (r, k), ms, gc, sz in zip(shapes, mask, g_ctrs, sizes):
                pa = [jnp.sum(jnp.where(
                    ms, jax.lax.slice_in_dim(a, off, off + sz,
                                             axis=0).reshape(r, k), 0.0),
                    axis=1) for a in (gx, gy, gz)]
                rows.append(jnp.stack(pa, axis=1) + gc)
                off += sz
        else:
            flat = jnp.concatenate(
                [gt.transpose(1, 2, 0).reshape(r * k, 3)
                 for gt, (r, k) in zip(g_outs, shapes)]
                + [jnp.zeros((1, 3), g_outs[0].dtype)], axis=0)
            rows = []
            for (r, k), ms, mr, gc in zip(shapes, mask, mir, g_ctrs):
                gm = flat[mr.reshape(-1)].reshape(r, k, 3).transpose(2, 0, 1)
                pa = jnp.sum(jnp.where(ms[None], gm, 0.0), axis=2)  # [3, R_t]
                rows.append(pa.T + gc)
        rows_all = jnp.concatenate(rows, axis=0)
        dp = rows_all[crow]                                  # [N, 3] gather
        return (dp,) + (None,) * 7

    tier_geometry.defvjp(_fwd, _bwd)
    return tier_geometry


@jax.custom_vjp
def _perm_gather(x, perm, inv_perm):
    """x[perm] for a PERMUTATION ``perm``, with the adjoint expressed as a
    gather through ``inv_perm`` instead of XLA's scatter transpose."""
    return x[perm]


def _perm_gather_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _perm_gather_bwd(inv_perm, g):
    return g[inv_perm], None, None


_perm_gather.defvjp(_perm_gather_fwd, _perm_gather_bwd)


@jax.custom_vjp
def _perm_gather_mid(x, perm, inv_perm):
    """x[:, perm] for a PERMUTATION ``perm`` along axis 1, adjoint
    ``g[:, inv_perm]`` (same scatter-avoidance as ``_perm_gather``; used by
    the cell-occupancy bucketing's coarse-row permutes, whose XLA transpose
    would otherwise be a [planes, ncells, kk] scatter-add per step)."""
    return x[:, perm]


def _perm_gather_mid_fwd(x, perm, inv_perm):
    return x[:, perm], inv_perm


def _perm_gather_mid_bwd(inv_perm, g):
    return g[:, inv_perm], None, None


_perm_gather_mid.defvjp(_perm_gather_mid_fwd, _perm_gather_mid_bwd)


@jax.custom_vjp
def _slot_pos_gather(p_ext, slot_to_atom, slot_of_atom):
    """Slot positions [cc, 3] from ``p_ext`` ([N+1, 3]; row N = the
    empty-slot fill) through the frozen injective slot->atom map. The
    adjoint is a gather through the inverse (atom->slot) map: every atom
    occupies at most one slot, so no scatter-add is ever needed."""
    n = p_ext.shape[0] - 1
    return p_ext[jnp.minimum(slot_to_atom, n)]


def _slot_pos_gather_fwd(p_ext, slot_to_atom, slot_of_atom):
    out = _slot_pos_gather(p_ext, slot_to_atom, slot_of_atom)
    return out, (slot_of_atom, out.shape[0])


def _slot_pos_gather_bwd(res, g):
    slot_of_atom, cc = res
    valid = slot_of_atom < cc
    dp = jnp.where(valid[:, None], g[jnp.minimum(slot_of_atom, cc - 1)], 0.0)
    zrow = jnp.zeros((1, 3), g.dtype)
    return jnp.concatenate([dp, zrow]), None, None


_slot_pos_gather.defvjp(_slot_pos_gather_fwd, _slot_pos_gather_bwd)


@jax.custom_vjp
def _row_extract(rad_flat, row_slots, slot_to_row):
    """Per-row radial AEV extraction ``rad_flat[row_slots]`` whose adjoint
    is a gather through the frozen slot->row inverse (``row_slots`` is
    injective: one radial slot per atom row)."""
    return rad_flat[row_slots]


def _row_extract_fwd(rad_flat, row_slots, slot_to_row):
    return rad_flat[row_slots], (slot_to_row, row_slots.shape[0])


def _row_extract_bwd(res, g):
    slot_to_row, n = res
    g_ext = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])
    return g_ext[jnp.minimum(slot_to_row, n)], None, None


_row_extract.defvjp(_row_extract_fwd, _row_extract_bwd)


def _make_stencil_window(ncells3: Tuple[int, int, int], c: int,
                         impl: Optional[str] = None):
    """Resolve the module-level STENCIL_IMPL default at call time (so A/B
    probes flipping it are not defeated by the lru_cache) and delegate."""
    return _make_stencil_window_impl(ncells3, c,
                                     STENCIL_IMPL if impl is None else impl)


@functools.lru_cache(maxsize=32)
def _make_stencil_window_impl(ncells3: Tuple[int, int, int], c: int,
                              impl: str):
    """planes [3, ncells, c] -> window [3, ncells, 27*c].

    ``impl='roll'`` (default, via module-level STENCIL_IMPL): the stencil
    IS a periodic 3D shift —
    stencil[i, e] = wrap(coord(i) + off_e) — so window entry e is
    ``jnp.roll(planes, -off_e)`` on the 3D cell grid: pure dense
    slice-concats (bandwidth) in BOTH directions, since a roll's transpose
    is the opposite roll (no gather, no scatter, no custom VJP). Valid
    whenever every grid dim >= 3 (window mode requires this,
    ``_check_window_config``) so the 27 offsets hit distinct cells.

    ``impl='gather'``: the original [ncells, 27] row-gather with a
    gather-based custom adjoint (XLA's scatter-add transpose of the
    stencil gather is much slower on TPU). Kept for A/B and as the
    fallback if a caller ever passes a <3-wide grid.
    """
    nx, ny, nz = (int(x) for x in ncells3)
    if impl not in ('roll', 'gather'):
        raise ValueError(f'unknown stencil impl {impl!r}')
    if impl == 'roll' and min(nx, ny, nz) >= 3:
        offs = np.array(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                    indexing='ij')).reshape(3, 27).T

        def stencil_window(planes):
            p5 = planes.reshape(planes.shape[0], nx, ny, nz, c)
            parts = [jnp.roll(p5, (-int(ox), -int(oy), -int(oz)),
                              axis=(1, 2, 3)) for ox, oy, oz in offs]
            win = jnp.stack(parts, axis=4)    # [3, nx, ny, nz, 27, c]
            return win.reshape(planes.shape[0], nx * ny * nz, 27 * c)

        return stencil_window

    _, stencil_np, rev_flat_np = _window_tables(ncells3)
    ncells = stencil_np.shape[0]
    kk = 27 * c

    @jax.custom_vjp
    def stencil_window(planes):
        stencil = jnp.asarray(stencil_np)
        return planes[:, stencil].reshape(planes.shape[0], ncells, kk)

    def _fwd(planes):
        return stencil_window(planes), None

    def _bwd(_, g):
        rev_flat = jnp.asarray(rev_flat_np)
        gr = g.reshape(g.shape[0], ncells * 27, c)
        dA = jnp.sum(gr[:, rev_flat], axis=2)         # [planes, ncells, c]
        return (dA,)

    stencil_window.defvjp(_fwd, _bwd)
    return stencil_window


def ang_as_rad_layout(layout: BlockedLayout) -> BlockedLayout:
    """The angular window expressed as a BlockedLayout whose 'radial' lanes
    are the angular lanes (window mode stores no radial lanes at all)."""
    return BlockedLayout(num_species=layout.num_species,
                         present=layout.present,
                         rad_caps=layout.ang_caps,
                         ang_caps=layout.ang_caps)


def _check_window_config(cell_list: CellList, layout: BlockedLayout) -> None:
    if layout.cell_caps is None or layout.cell_grid is None:
        raise ValueError('window mode needs a layout planned with cell '
                         'capacities (ANIModel.with_blocked_layout('
                         "impl='window'))")
    if not cell_list.use_cells:
        raise ValueError('window mode requires a cell decomposition '
                         '(>= 3 cells per axis); use aev_impl="pallas" for '
                         'small or non-periodic systems')
    if tuple(cell_list.ncells) != tuple(layout.cell_grid):
        raise ValueError(f'cell grid mismatch: cell list {cell_list.ncells} '
                         f'vs planned {layout.cell_grid} — build the cell '
                         'list with ANIModel.create_cell_list')
    if cell_list.cell_capacity != sum(layout.cell_caps):
        raise ValueError(f'cell capacity mismatch: cell list '
                         f'{cell_list.cell_capacity} vs planned '
                         f'{sum(layout.cell_caps)} — build the cell list '
                         'with ANIModel.create_cell_list')


def _compact_window_kernel(cc: int, cell_caps: Tuple[int, ...],
                           a_caps: Tuple[int, ...], valid_ang: Array,
                           cand_slot_atom: Array):
    """Left-pack compaction via the Pallas rank kernel (ops/pallas_select):
    a 0/1 MXU matmul computes each valid lane's rank and cap masked
    row-sums extract the packed keys — replaces the per-species bitonic
    lane sorts (4.8 -> ~1 ms of the 26k select). Output lanes are in
    window-lane (stencil-entry-major) order rather than the sort's
    slot-ascending order; all consumers are order-agnostic."""
    lane_sizes = [27 * cs for cs in cell_caps]
    # Fall back to the sort path when slot ids would lose f32 exactness OR
    # when the left-pack kernels cannot fit scoped VMEM (shared helper —
    # the kernels raise ValueError under exactly this condition, so the
    # guard cannot drift from it).
    from ..ops.pallas_select import left_pack, left_pack_supported
    if cc + 1 >= 2 ** 24 or not left_pack_supported(lane_sizes):
        return _compact_window(cc, cell_caps, a_caps, valid_ang,
                               cand_slot_atom)
    lane_offs = np.cumsum((0,) + tuple(lane_sizes))[:-1]
    krt = int(sum(a_caps))
    parts = []
    for lo, w in zip(lane_offs, lane_sizes):
        v = jax.lax.slice_in_dim(valid_ang, int(lo), int(lo) + w, axis=1)
        s = jax.lax.slice_in_dim(cand_slot_atom, int(lo), int(lo) + w,
                                 axis=1)
        combo = jnp.where(v, s.astype(jnp.float32), -1.0)
        pw = _round_up_128(w)
        if pw != w:
            combo = jnp.pad(combo, ((0, 0), (0, pw - w)),
                            constant_values=-1.0)
        parts.append(combo)
    packed, counts_f = left_pack(jnp.concatenate(parts, axis=1),
                                 tuple(lane_sizes), tuple(a_caps))
    m = packed >= 0.0
    nbr = jnp.where(m, packed, float(cc)).astype(jnp.int32)
    air_parts = []
    ro = 0
    for cap in a_caps:
        air_parts.append(jnp.arange(ro, ro + cap, dtype=jnp.int32)[None])
        ro += cap
    air = jnp.where(m, jnp.concatenate(air_parts, axis=1), krt)
    return nbr, m, counts_f.astype(jnp.int32), air


def _round_up_128(x: int) -> int:
    return -(-x // 128) * 128


def _compact_window_mask(cc: int, cell_caps: Tuple[int, ...],
                         a_caps: Tuple[int, ...], cand_planes: Array,
                         pos_slots: Array, slot_of_sorted: Array,
                         cell_sorted: Array, stencil_np: np.ndarray,
                         w2: float):
    """Mask-driven compaction (round 4): the d2/validity test runs in SLOT
    space (``ops.pallas_select.make_window_mask`` — one kernel over cells
    reading the coarse [3, ncells, kk] window, no [N, 3, kk] per-atom
    candidate gather), atoms fetch their slot's bf16 mask row, and the rank
    left-pack packs STATIC LANE indices (``make_left_pack_lanes`` — no slot
    key tensor either). Slot ids are reconstructed arithmetically from the
    packed block-local lanes: lane l of species block s = stencil entry
    l // cs, slot offset l % cs, so the only remaining gathers are two
    [N]-row fetches (mask rows, stencil rows). Replaced traffic at 26k:
    ~700 MB of materialized candidate/d2/key intermediates -> ~130 MB
    (measured 5.1 + 0.9 ms -> target ~1.5 ms of the select).

    Semantics match ``_compact_window_kernel`` exactly: same validity set
    (d2 < w2, static self-lane exclusion), same entry-major packed lane
    order, same per-species true counts.
    """
    from ..ops.pallas_select import make_left_pack_lanes, make_window_mask
    c = sum(cell_caps)
    kk = 27 * c
    ncells = cand_planes.shape[1]
    n = slot_of_sorted.shape[0]
    mask_fn = make_window_mask(float(w2), tuple(cell_caps))
    centers = pos_slots.reshape(ncells, c, 3)
    m_slots = mask_fn(cand_planes[0], cand_planes[1], cand_planes[2],
                      centers)
    m_flat = m_slots.reshape(ncells * c, kk)
    # Overflow atoms (slot rank past capacity, sentinel cc+1) read a
    # clamped garbage row — results already invalid per the soft-failure
    # contract (max_cell_sp_ang reports the breach).
    m_atom = m_flat[jnp.minimum(slot_of_sorted, ncells * c - 1)]  # [N, kk]
    lane_sizes = [27 * cs for cs in cell_caps]
    lane_offs = np.cumsum((0,) + tuple(lane_sizes))[:-1]
    parts = []
    for lo, w in zip(lane_offs, lane_sizes):
        p = jax.lax.slice_in_dim(m_atom, int(lo), int(lo) + w, axis=1)
        pw = _round_up_128(w)
        if pw != w:
            p = jnp.pad(p, ((0, 0), (0, pw - w)))
        parts.append(p)
    pack_fn = make_left_pack_lanes(tuple(lane_sizes), tuple(a_caps))
    lanes, counts_f = pack_fn(jnp.concatenate(parts, axis=1))
    offs = np.cumsum((0,) + tuple(cell_caps))[:-1]
    stencil_rows = jnp.asarray(stencil_np, jnp.int32)[cell_sorted]  # [N, 27]
    krt = int(sum(a_caps))
    nbrs, masks, airs = [], [], []
    ro = 0
    for s, (cs, cap) in enumerate(zip(cell_caps, a_caps)):
        ln = jax.lax.slice_in_dim(lanes, ro, ro + cap, axis=1)
        m = ln >= 0.0
        li = jnp.where(m, ln, 0.0).astype(jnp.int32)
        entry = li // cs                       # block-local stencil entry
        so = li - entry * cs                   # within-cell slot offset
        base = jnp.zeros((n, cap), jnp.int32)
        for e in range(27):                    # one-hot select: no [N, cap]
            base = base + jnp.where(entry == e,        # table gather
                                    stencil_rows[:, e:e + 1], 0)
        slot = base * c + (int(offs[s]) + so)
        nbrs.append(jnp.where(m, slot, cc))
        masks.append(m)
        airs.append(jnp.where(
            m, jnp.arange(ro, ro + cap, dtype=jnp.int32)[None], krt))
        ro += cap
    return (jnp.concatenate(nbrs, axis=1), jnp.concatenate(masks, axis=1),
            counts_f.astype(jnp.int32), jnp.concatenate(airs, axis=1))


def _compact_window(cc: int, cell_caps: Tuple[int, ...],
                    a_caps: Tuple[int, ...], valid_ang: Array,
                    cand_slot_atom: Array):
    """Per-species angular compaction specialized to species-major windows.

    The lane species is STATIC here (species s owns the contiguous lane
    block [27*off_s, 27*(off_s+cell_caps[s]))), so each species compacts
    with one sort of its own lane slice and the true per-species counts are
    plain slice sums — no stage-1 wide packed sort, no decode, no masked
    full-width reductions (the generic ``blocked._compact_blocked``
    machinery that cost ~18 ms of the 26k select).

    ``cell_caps``: the per-species slot capacities of the grid the window
    was built on (the ANGULAR grid in dual-grid mode).

    Returns (nbr [N, Kat], mask [N, Kat], counts [N, npres],
    ang_in_rad [N, Kat]) in cell-sorted row space, lanes slot-ascending
    within each species block.
    """
    lane_sizes = [27 * cs for cs in cell_caps]
    lane_offs = np.cumsum((0,) + tuple(lane_sizes))[:-1]
    big = jnp.int32(2 ** 31 - 1)
    krt = int(sum(a_caps))
    nbr, masks, counts, air = [], [], [], []
    ro = 0
    for i, (lo, w) in enumerate(zip(lane_offs, lane_sizes)):
        v = jax.lax.slice_in_dim(valid_ang, int(lo), int(lo) + w, axis=1)
        s = jax.lax.slice_in_dim(cand_slot_atom, int(lo), int(lo) + w,
                                 axis=1)
        counts.append(jnp.sum(v.astype(jnp.int32), axis=1))
        key = jnp.where(v, s, big)
        key = jax.lax.sort(key, dimension=1)[:, :a_caps[i]]
        m = key < big
        nbr.append(jnp.where(m, key, cc))
        masks.append(m)
        air.append(jnp.where(
            m, jnp.arange(ro, ro + a_caps[i], dtype=jnp.int32)[None], krt))
        ro += a_caps[i]
    return (jnp.concatenate(nbr, axis=1), jnp.concatenate(masks, axis=1),
            jnp.stack(counts, axis=1), jnp.concatenate(air, axis=1))


@functools.lru_cache(maxsize=32)
def _lane_tables(cell_caps: Tuple[int, ...]):
    """Static per-window-lane tables for species-major windows.

    Window lane layout: for species s (present order), a contiguous block
    of 27 * cell_caps[s] lanes, entry-major within the block. Returns
    (entry_of_lane [kk], slotoff_of_lane [kk]) where the global cell-slot
    id of lane j in cell `cl` is stencil[cl, entry[j]] * c + slotoff[j].
    """
    offs = np.cumsum((0,) + cell_caps)[:-1]
    entry, slotoff = [], []
    for s, cs in enumerate(cell_caps):
        e = np.repeat(np.arange(27), cs)
        r = np.tile(np.arange(cs), 27) + offs[s]
        entry.append(e)
        slotoff.append(r)
    return (np.concatenate(entry).astype(np.int32),
            np.concatenate(slotoff).astype(np.int32))


def _grid_sort(p_w: Array, box: Array, sp_idx_np: np.ndarray,
               ncells3: Tuple[int, int, int], cell_caps: Tuple[int, ...],
               npres: int):
    """Species-sub-blocked slot assignment on one cell grid: sort by
    (cell, species), rank within each segment. ``p_w`` must already be
    wrapped into the primary box."""
    nx, ny, nz = ncells3
    ncells = nx * ny * nz
    c = sum(cell_caps)
    cc = ncells * c
    n = p_w.shape[0]
    ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
    inv = jnp.linalg.inv(box)
    frac = box_transform(p_w, inv)
    frac = frac - jnp.floor(frac)            # guard fp noise at 0/1
    cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0, ncells_arr - 1)
    cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]
    key = cell_id * npres + jnp.asarray(sp_idx_np)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    sorted_key = key[order]
    idx_n = jnp.arange(n, dtype=jnp.int32)
    new_seg = jnp.concatenate([jnp.ones((1,), bool),
                               sorted_key[1:] != sorted_key[:-1]])
    seg_start = jax.lax.cummax(jnp.where(new_seg, idx_n, 0))
    rank_sorted = idx_n - seg_start
    cell_sorted = sorted_key // npres
    sp_sorted = sorted_key % npres
    caps_arr = jnp.asarray(np.asarray(cell_caps, np.int32))
    offs_arr = jnp.asarray(np.cumsum((0,) + tuple(cell_caps))[:-1]
                           .astype(np.int32))
    slot_of_sorted = jnp.where(
        rank_sorted < caps_arr[sp_sorted],
        cell_sorted * c + offs_arr[sp_sorted] + rank_sorted,
        cc + 1).astype(jnp.int32)
    seg_counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), key,
                                     num_segments=ncells * npres)
    cell_sp_counts = seg_counts.reshape(ncells, npres)
    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(idx_n, mode='drop')
    return order, slot_of_sorted, inv_order, cell_sorted, cell_sp_counts


def select_window(cell_list: CellList, positions: Array, box: Array,
                  species: np.ndarray, layout: BlockedLayout,
                  radial_cutoff: float, angular_cutoff: float,
                  grouping_order: Optional[np.ndarray] = None,
                  present_counts: Optional[Tuple[int, ...]] = None,
                  need_shift_planes: bool = False,
                  cluster_plan=None,
                  compact_impl: str = 'kernel') -> WindowSelection:
    """Freeze a window-mode selection.

    ``layout``: ``ang_caps``/``present`` drive the angular compaction;
    ``cell_caps``/``cell_grid`` the radial species-sub-blocked slot
    assignment; ``ang_cell_grid``/``ang_cell_caps`` (optional) a dedicated
    smaller grid for the angular candidate window — the whole [N, 27c]
    candidate/compaction phase exists only to find ANGULAR neighbors (the
    radial kernels are window-dense and capacity-free), so running it on
    cells sized by the angular window cuts it ~2.5x at ANI cutoffs.
    ``grouping_order``/``present_counts`` (the model's static species
    grouping) enable angular row tiering when the layout plans it.
    ``need_shift_planes``: build the radial-grid 27-entry shift planes
    (only the directed 'window' radial kernel consumes them).
    ``compact_impl``: 'kernel' (default) = per-atom Pallas rank left-pack
    on slot keys; 'mask' = slot-space validity-mask kernel + lane-index
    rank left-pack (no per-atom candidate gather; measured a WASH vs
    'kernel' at 26k — 2.56 vs 2.39 ms — because XLA already fuses the
    candidate gather into the combo build, NOTES_PERF r4); 'sort' =
    per-species bitonic lane sorts (the reference-ordering path,
    slot-ascending lanes).
    """
    _check_window_config(cell_list, layout)
    positions = jax.lax.stop_gradient(positions)
    box = jax.lax.stop_gradient(box)
    n = positions.shape[0]
    ncells = cell_list.num_cells
    cell_caps = layout.cell_caps
    npres = len(layout.present)
    c = sum(cell_caps)

    inv = jnp.linalg.inv(box)
    frac = box_transform(positions, inv)
    wrap_f = jnp.floor(frac)
    wrap_shift = box_transform(wrap_f, box)
    p_w = positions - wrap_shift

    pres_table = np.full(layout.num_species + 1, npres, np.int32)
    for i, s in enumerate(layout.present):
        pres_table[s] = i
    sp_idx_np = pres_table[np.asarray(species, np.int32)]       # static

    # ---- Radial grid: slot assignment only (the radial kernels are
    # window-dense; no candidate list, no capacity beyond the cell slots).
    (order_r, slot_r, inv_r, cell_sorted_r,
     counts_r) = _grid_sort(p_w, box, sp_idx_np, tuple(cell_list.ncells),
                            cell_caps, npres)
    max_cell_sp = jnp.max(counts_r, axis=0)
    max_occ = jnp.max(jnp.sum(counts_r, axis=1))
    idx_n = jnp.arange(n, dtype=jnp.int32)
    rad_slot_of_atom = jnp.zeros((n,), jnp.int32).at[order_r].set(
        slot_r, mode='drop')
    rad_slot_to_atom = jnp.full((ncells * c,), n, jnp.int32).at[slot_r].set(
        order_r, mode='drop')

    # Cell-occupancy classes: big cells (any species beyond small_caps)
    # sort to the front of the frozen permutation.
    if layout.small_caps is not None:
        is_big = jnp.any(counts_r > jnp.asarray(layout.small_caps), axis=1)
        cell_perm = jnp.argsort(~is_big, stable=True).astype(jnp.int32)
        n_big_true = jnp.sum(is_big.astype(jnp.int32))
    else:
        cell_perm = jnp.arange(ncells, dtype=jnp.int32)
        n_big_true = jnp.zeros((), jnp.int32)

    if need_shift_planes:
        f27_np, _, _ = _window_tables(tuple(cell_list.ncells))
        shift27 = box_transform(jnp.asarray(f27_np), box)   # [cells, 27, 3]
        shift_parts = [jnp.repeat(shift27.transpose(2, 0, 1), cs, axis=2)
                       for cs in cell_caps]
        shift_planes = jnp.concatenate(shift_parts, axis=2)  # [3, cells, kk]
    else:
        shift_planes = jnp.zeros((1, 1, 1), positions.dtype)

    # ---- Angular grid: candidate window + per-species compaction.
    if layout.ang_cell_grid is not None and layout.ang_cell_caps is not None:
        a_grid = tuple(int(x) for x in layout.ang_cell_grid)
        a_ccaps = tuple(int(x) for x in layout.ang_cell_caps)
    else:
        a_grid = tuple(int(x) for x in cell_list.ncells)
        a_ccaps = cell_caps
    same_grid = a_grid == tuple(cell_list.ncells) and a_ccaps == cell_caps
    c_a = sum(a_ccaps)
    ncells_a = int(np.prod(a_grid))
    cc_a = ncells_a * c_a
    if same_grid:
        order, slot_of_sorted, inv_order = order_r, slot_r, inv_r
        cell_sorted, counts_a = cell_sorted_r, counts_r
    else:
        (order, slot_of_sorted, inv_order, cell_sorted,
         counts_a) = _grid_sort(p_w, box, sp_idx_np, a_grid, a_ccaps, npres)
    max_cell_sp_ang = jnp.max(counts_a, axis=0)
    pos_sorted = p_w[order]
    pos_slots = jnp.full((cc_a, 3), FAR, positions.dtype)
    pos_slots = pos_slots.at[slot_of_sorted].set(pos_sorted, mode='drop')

    a_offs = np.cumsum((0,) + a_ccaps)[:-1].astype(np.int32)
    f27a_np, stencil_a_np, _ = _window_tables(a_grid)
    shift27a = box_transform(jnp.asarray(f27a_np), box)
    shift_parts_a = [jnp.repeat(shift27a.transpose(2, 0, 1), cs, axis=2)
                     for cs in a_ccaps]
    shift_planes_a = jnp.concatenate(shift_parts_a, axis=2)

    planes = pos_slots.T.reshape(3, ncells_a, c_a)
    wins = []
    for i, cs in enumerate(a_ccaps):
        sub = planes[:, :, a_offs[i]:a_offs[i] + cs]
        wins.append(_make_stencil_window(a_grid, cs)(sub))
    cand_cells = jnp.concatenate(wins, axis=2) + shift_planes_a
    skin = cell_list.cutoff - radial_cutoff
    ang_window = angular_cutoff + max(skin, 0.0)

    # Same VMEM guard as _compact_window_kernel (shared helper, cannot
    # drift from the kernels' own ValueError threshold).
    from ..ops.pallas_select import left_pack_supported
    use_mask = (compact_impl == 'mask'
                and left_pack_supported([27 * cs for cs in a_ccaps]))
    if use_mask:
        nbr, mask, counts, air = _compact_window_mask(
            cc_a, a_ccaps, layout.ang_caps, cand_cells, pos_slots,
            slot_of_sorted, cell_sorted, stencil_a_np,
            ang_window * ang_window)
    else:
        cand_pos = cand_cells.transpose(1, 0, 2)[cell_sorted]  # [N, 3, kk_a]
        dx = cand_pos[:, 0, :] - pos_sorted[:, 0:1]
        dy = cand_pos[:, 1, :] - pos_sorted[:, 1:2]
        dz = cand_pos[:, 2, :] - pos_sorted[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz

        entry_np, slotoff_np = _lane_tables(a_ccaps)
        cand_slot = (jnp.asarray(stencil_a_np)[:, jnp.asarray(entry_np)]
                     * c_a + jnp.asarray(slotoff_np))       # [ncells_a, kk_a]
        cand_slot_atom = cand_slot[cell_sorted]
        not_self = cand_slot_atom != slot_of_sorted[:, None]
        valid_ang = (d2 < ang_window * ang_window) & not_self

        compact = (_compact_window_kernel if compact_impl == 'kernel'
                   else _compact_window)
        nbr, mask, counts, air = compact(cc_a, a_ccaps, layout.ang_caps,
                                         valid_ang, cand_slot_atom)
    max_ang = jnp.max(counts, axis=0)            # [npres]
    slot32 = slot_of_sorted
    slot_to_atom = jnp.full((cc_a + 1,), n, jnp.int32)
    slot_to_atom = slot_to_atom.at[slot_of_sorted].set(order, mode='drop')
    tiering = (grouping_order is not None and present_counts is not None
               and layout.ang_tier_caps is not None
               and layout.ang_tier_rows is not None)
    if tiering:
        # The full-width mirror is never consumed on the tiered path (the
        # angular payload rides _tiered_gather's packed mirror); skip the
        # two flat [N*Kat] sorts it would cost.
        mirror = jnp.zeros((1, 1), jnp.int32)
    else:
        mirror = _build_mirror(slot32, nbr, mask, cc_a)
    bsel = BlockedSelection(
        order=order, slot_of_sorted=slot32, inv_order=inv_order,
        slot_to_atom=slot_to_atom, nbr_rad=nbr, rad_mask=mask,
        nbr_ang=nbr, ang_mask=mask, max_rad=max_ang, max_ang=max_ang,
        max_cell_occupancy=max_occ, mirror=mirror, ang_in_rad=air)
    tier = None
    if tiering:
        tier = _build_tier_packed(nbr, mask, counts, slot32, inv_order,
                                  grouping_order,
                                  tuple(int(x) for x in present_counts),
                                  layout, cc_a, grid3=a_grid,
                                  c_per_cell=c_a)
    clusters = None
    if cluster_plan is not None:
        from .clusters import select_clusters
        clusters = select_clusters(positions, box, species, cluster_plan,
                                   radial_cutoff,
                                   skin=cell_list.cutoff - radial_cutoff)
    rad_slot_to_row = None
    if tier is not None:
        # slot -> tier row (empty slots keep the N sentinel): lets the
        # radial row-extraction adjoint run as a frozen gather.
        roa_ext = jnp.concatenate(
            [tier.row_of_atom, jnp.full((1,), n, jnp.int32)])
        rad_slot_to_row = roa_ext[jnp.minimum(rad_slot_to_atom, n)]
    return WindowSelection(ang=bsel, shift_planes=shift_planes,
                           wrap_shift=wrap_shift, max_cell_sp=max_cell_sp,
                           cell_perm=cell_perm, n_big_true=n_big_true,
                           rad_order=order_r, rad_slot_of_sorted=slot_r,
                           rad_slot_of_atom=rad_slot_of_atom,
                           max_cell_sp_ang=max_cell_sp_ang,
                           tier=tier, clusters=clusters,
                           rad_slot_to_atom=rad_slot_to_atom,
                           rad_slot_to_row=rad_slot_to_row)


def _part_deltas(out3, centers, mask, box):
    """Minimum-imaged coordinate-plane deltas for one tier's gathered
    neighbor positions (rows x lanes)."""
    dx = out3[0] - centers[:, 0:1]
    dy = out3[1] - centers[:, 1:2]
    dz = out3[2] - centers[:, 2:3]
    if box is not None:
        s3 = jnp.round(dz / box[2, 2])
        dx = dx - s3 * box[2, 0]
        dy = dy - s3 * box[2, 1]
        dz = dz - s3 * box[2, 2]
        s2 = jnp.round(dy / box[1, 1])
        dx = dx - s2 * box[1, 0]
        dy = dy - s2 * box[1, 1]
        dx = dx - jnp.round(dx / box[0, 0]) * box[0, 0]
    deltas = jnp.stack([dx, dy, dz])
    return jnp.where(mask[None], deltas, 0.0)


def tier_layouts(layout: BlockedLayout):
    """Per-tier kernel layouts: tier 0 = the full angular caps, tier t =
    ang_tier_caps[t-1] as both rad and ang caps."""
    lays = [ang_as_rad_layout(layout)]
    for caps_t in layout.ang_tier_caps:
        lays.append(BlockedLayout(num_species=layout.num_species,
                                  present=layout.present,
                                  rad_caps=caps_t, ang_caps=caps_t))
    return lays


def tier_bwd_impl(caps_t) -> str:
    """Kernel-backward A/B on chip (NOTES_PERF r3): the matmul cotangent
    broadcast (v2) wins on narrow triple tables, the slice-FMA loop (v1)
    on wide ones (measured crossover between Tp 512 and 1152)."""
    return 'v1' if _num_triples(caps_t) >= 768 else 'v2'


def _tiered_angular(positions: Array, box: Array,
                    wsel: WindowSelection, basis, layout: BlockedLayout,
                    cc: int, interpret):
    """N-tier angular AEV: tier-t rows run against their tier's
    (quadratically smaller) triple table, via one joint mirror-adjoint
    gather. ``cc`` is the ANGULAR grid's slot count. Returns (tiered
    row_atom, angular)."""
    from ..ops.pallas_aev import angular_aev_pallas
    sel = wsel.ang
    t = wsel.tier
    caps_all = (layout.ang_caps,) + tuple(layout.ang_tier_caps)
    lays = tier_layouts(layout)
    outs, ctrs = _make_tier_geometry(cc, mirror_impl=MIRROR_IMPL)(
        positions, sel.order, sel.slot_of_sorted, t.idx, t.mask,
        t.slot_rows, t.mir, t.crow_of_atom)
    angs = []
    for ti in range(len(caps_all)):
        deltas = _part_deltas(outs[ti], ctrs[ti], t.mask[ti], box)
        angs.append(angular_aev_pallas(
            deltas, t.mask[ti], basis, lays[ti], interpret=interpret,
            rad_width=deltas.shape[2], bwd_impl=tier_bwd_impl(caps_all[ti])))
    cat = jnp.concatenate(angs, axis=0)
    angular = _perm_gather(cat, t.concat_pos, t.inv_concat_pos)
    return t.row_atom, angular


def window_features(cell_list: CellList, positions: Array, box: Array,
                    wsel: WindowSelection, basis, layout: BlockedLayout,
                    atom_order: Optional[Array] = None,
                    interpret: Optional[bool] = None,
                    radial_impl: str = 'window') -> Array:
    """Full AEV [N, aev_length] (reference layout: radial [S*R] ‖ angular
    [P*A], SymmetryFunctions.py:120-122) for window mode, differentiable in
    ``positions``.

    ``atom_order``: optional [N] atom index per output row (e.g. the
    model's static species grouping); default = original atom order.
    When tiering is active the rows come out in the tier's big-first
    permutation of that order instead (species blocks preserved).

    ``radial_impl``: 'pair' (symmetric cell-pair kernel, each atom pair's
    Gaussian ladder evaluated once — ``ops.pallas_zpair``) or 'window'
    (directed 27-cell window kernel, supports cell-occupancy bucketing;
    needs ``select_window(need_shift_planes=True)``)."""
    from ..ops.pallas_aev import angular_aev_pallas
    sel = wsel.ang
    n = positions.shape[0]
    ncells = cell_list.num_cells
    cell_caps = layout.cell_caps
    c = sum(cell_caps)
    cc = ncells * c                                         # radial slots
    if layout.ang_cell_grid is not None and layout.ang_cell_caps is not None:
        cc_a = int(np.prod(layout.ang_cell_grid)) * sum(layout.ang_cell_caps)
    else:
        cc_a = cc
    a_layout = ang_as_rad_layout(layout)
    ao = (jnp.asarray(atom_order, jnp.int32) if atom_order is not None
          else jnp.arange(n, dtype=jnp.int32))

    if wsel.tier is not None:
        row_atom, angular = _tiered_angular(
            positions, box, wsel, basis, layout, cc_a, interpret)
    else:
        # --- Angular: compacted-lane payload (mirror-adjoint gather) + the
        # fused Pallas angular kernel, all shared with the blocked path.
        pay = payload_from_blocked(cell_list, positions, box, sel,
                                   rad_only=True, row_order=sel.inv_order[ao],
                                   num_slots=cc_a)
        angular = angular_aev_pallas(pay.rad_deltas, pay.ang_mask, basis,
                                     a_layout, interpret=interpret,
                                     rad_width=pay.rad_deltas.shape[2])
        row_atom = ao

    num_r = basis.num_radial
    if radial_impl == 'cluster':
        if wsel.clusters is None or layout.cluster_plan is None:
            raise ValueError("radial_impl='cluster' needs a selection built "
                             'with a cluster_plan')
        from .clusters import cluster_radial_features
        radial_rows = cluster_radial_features(
            positions, wsel.clusters, layout.cluster_plan, basis, row_atom,
            interpret=interpret)
        return _expand_radial_rows(radial_rows, angular, layout, basis, n,
                                   num_r)

    # --- Radial: dense window kernels on the radial grid, capacity-free.
    p_w = positions - wsel.wrap_shift
    if wsel.rad_slot_to_atom is not None:
        # Injective slot<->atom maps: both directions of the slot build are
        # gathers (no scatter-add in the VJP).
        p_ext = jnp.concatenate([p_w, jnp.full((1, 3), FAR,
                                                positions.dtype)])
        slots = _slot_pos_gather(p_ext, wsel.rad_slot_to_atom,
                                 wsel.rad_slot_of_atom)
    else:
        pos_sorted = p_w[wsel.rad_order]
        slots = jnp.full((cc, 3), FAR, positions.dtype)
        slots = slots.at[wsel.rad_slot_of_sorted].set(pos_sorted,
                                                      mode='drop')
    npres = len(layout.present)
    offs = np.cumsum((0,) + cell_caps)[:-1]
    if radial_impl == 'pair':
        from ..ops.pallas_zpair import pair_radial_aev
        rad_slots = pair_radial_aev(
            slots, box, cell_list.ncells, cell_caps,
            basis.radial_cutoff, basis.radial_eta, basis.radial_rs,
            basis.torchani, interpret=interpret)
        return _radial_rows_from_slots(rad_slots, angular, wsel, layout,
                                       basis, n, cc, num_r, row_atom)
    if wsel.shift_planes.shape[1] != ncells:
        raise ValueError("radial_impl='window' needs a selection built "
                         'with need_shift_planes=True')
    planes = slots.T.reshape(3, ncells, c)
    wins = []
    for i, cs in enumerate(cell_caps):
        sub = planes[:, :, int(offs[i]):int(offs[i]) + cs]
        wins.append(_make_stencil_window(cell_list.ncells, cs)(sub))
    win = jnp.concatenate(wins, axis=2) + wsel.shift_planes
    centers = slots.reshape(ncells, c, 3)
    if layout.small_caps is None or layout.num_big_cells is None:
        rad_slots = window_radial_aev(
            win[0], win[1], win[2], centers,
            basis.radial_cutoff, basis.radial_eta, basis.radial_rs,
            cell_caps, basis.torchani, interpret=interpret)
    else:
        # Cell-occupancy bucketing: big cells (frozen permutation front)
        # run at full center rows, the rest with species-packed rows.
        # All three coarse-row permutes ride permutation-gather custom
        # VJPs: XLA's transpose of a plain gather is a scatter-add, which
        # at these shapes ([3, ncells, kk] etc.) cost ~3.6 ms/step of the
        # 26k backward (NOTES_PERF r4 'radial bwd glue'; scatter ~5x a
        # gather at equal rows).
        perm = wsel.cell_perm
        inv_perm = jnp.zeros((ncells,), jnp.int32).at[perm].set(
            jnp.arange(ncells, dtype=jnp.int32))
        nb = layout.num_big_cells
        sc = layout.small_caps
        winp = _perm_gather_mid(win, perm, inv_perm)   # [3, ncells, kk]
        ctrp = _perm_gather(centers, perm, inv_perm)
        rad_a = window_radial_aev(
            winp[0, :nb], winp[1, :nb], winp[2, :nb], ctrp[:nb],
            basis.radial_cutoff, basis.radial_eta, basis.radial_rs,
            cell_caps, basis.torchani, interpret=interpret)
        ctr_small = jnp.concatenate(
            [ctrp[nb:, int(offs[i]):int(offs[i]) + sc[i]]
             for i in range(npres)], axis=1)
        rad_b = window_radial_aev(
            winp[0, nb:], winp[1, nb:], winp[2, nb:], ctr_small,
            basis.radial_cutoff, basis.radial_eta, basis.radial_rs,
            cell_caps, basis.torchani, interpret=interpret,
            center_caps=sc)
        # Re-expand packed small rows to the full per-cell slot layout.
        sc_offs = np.cumsum((0,) + tuple(sc))[:-1]
        ns = ncells - nb
        pieces = []
        for i in range(npres):
            blk = rad_b[:, int(sc_offs[i]):int(sc_offs[i]) + sc[i]]
            padr = cell_caps[i] - sc[i]
            if padr:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((ns, padr, blk.shape[2]), blk.dtype)],
                    axis=1)
            pieces.append(blk)
        rad_b_full = jnp.concatenate(pieces, axis=1)   # [ns, c, out_w]
        rad_perm = jnp.concatenate([rad_a, rad_b_full], axis=0)
        rad_slots = _perm_gather(rad_perm, inv_perm, perm)  # coarse rows
    return _radial_rows_from_slots(rad_slots, angular, wsel, layout, basis,
                                   n, cc, num_r, row_atom)


def _radial_rows_from_slots(rad_slots, angular, wsel, layout, basis, n, cc,
                            num_r, row_atom):
    """Slot-space radial AEV -> per-atom rows in the full [S*R] species
    layout (``row_atom``: atom index per output row), concatenated with the
    angular block."""
    npres = len(layout.present)
    rad_flat = rad_slots.reshape(cc, npres * num_r)
    row_slots = jnp.minimum(wsel.rad_slot_of_atom[row_atom], cc - 1)
    if wsel.rad_slot_to_row is not None:
        # row_slots is injective (one slot per atom row): adjoint = gather.
        radial_rows = _row_extract(rad_flat, row_slots,
                                   wsel.rad_slot_to_row)   # [N, P*R]
    else:
        radial_rows = rad_flat[row_slots]                   # [N, P*R]
    return _expand_radial_rows(radial_rows, angular, layout, basis, n,
                               num_r)


def _expand_radial_rows(radial_rows, angular, layout, basis, n, num_r):
    """[N, P*R] present-species radial rows -> full [S*R] layout, ‖ angular."""
    pieces = []
    for s in range(basis.num_species):
        if s in layout.present:
            i = layout.present.index(s)
            pieces.append(radial_rows[:, i * num_r:(i + 1) * num_r])
        else:
            pieces.append(jnp.zeros((n, num_r), radial_rows.dtype))
    radial_full = jnp.concatenate(pieces, axis=1)           # [N, S*R]
    return jnp.concatenate([radial_full, angular], axis=1)
