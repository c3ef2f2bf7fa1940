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
  The compaction machinery is ``blocked._compact_blocked`` run with the
  angular validity for both windows, so the angular list, its mirror, and
  the payload/Pallas kernels are exactly the battle-tested blocked-path
  components.

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

from ..ops.pallas_window import FAR, window_radial_aev
from .blocked import (BlockedLayout, BlockedSelection, _compact_blocked,
                      payload_from_blocked)
from .cell_list import CellList, _perpendicular_widths

Array = jnp.ndarray


class WindowSelection(NamedTuple):
    """Frozen window-mode selection (refresh-scoped, like BlockedSelection).

    ``ang``: a BlockedSelection whose "radial" lanes ARE the angular window
    (``rad_caps == ang_caps``), including the mirror list for the angular
    payload gather's adjoint.
    """
    ang: BlockedSelection
    shift_planes: Array    # [3, ncells, kk] periodic image shifts
    wrap_shift: Array      # [N, 3] frozen box wrap per atom
    max_cell_sp: Array     # [npres] true max per-(cell, species) occupancy
    # Cell-occupancy bucketing (frozen per refresh): cells permuted so the
    # (at most num_big_cells) high-occupancy cells come first; identity
    # permutation when bucketing is disabled.
    cell_perm: Array       # [ncells] int32
    n_big_true: Array      # scalar int32 — true big-cell count


def plan_window_cells(positions, box, species, present,
                      cutoff: float, margin: float = 1.15):
    """Host-side planner: (cell_grid, cell_caps, small_caps, num_big_cells)
    for species-sub-blocked window slots, or all-None when the box is under
    3 cells wide (window mode impossible).

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
    pad = (-sum(caps)) % 8          # sublane-align the total cell block
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
def _make_stencil_window(ncells3: Tuple[int, int, int], c: int):
    """planes [3, ncells, c] -> window [3, ncells, 27*c] with a
    gather-based custom adjoint (XLA's scatter-add transpose of the stencil
    gather is much slower on TPU)."""
    _, stencil_np, rev_flat_np = _window_tables(ncells3)
    ncells = stencil_np.shape[0]
    kk = 27 * c

    @jax.custom_vjp
    def stencil_window(planes):
        stencil = jnp.asarray(stencil_np)
        return planes[:, stencil].reshape(3, ncells, kk)

    def _fwd(planes):
        return stencil_window(planes), None

    def _bwd(_, g):
        rev_flat = jnp.asarray(rev_flat_np)
        gr = g.reshape(3, ncells * 27, c)
        dA = jnp.sum(gr[:, rev_flat], axis=2)              # [3, ncells, c]
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


def select_window(cell_list: CellList, positions: Array, box: Array,
                  species: np.ndarray, layout: BlockedLayout,
                  radial_cutoff: float, angular_cutoff: float,
                  ) -> WindowSelection:
    """Freeze a window-mode selection.

    ``layout``: ``ang_caps``/``present`` drive the angular compaction;
    ``cell_caps``/``cell_grid`` the species-sub-blocked slot assignment.
    """
    _check_window_config(cell_list, layout)
    positions = jax.lax.stop_gradient(positions)
    box = jax.lax.stop_gradient(box)
    n = positions.shape[0]
    nx, ny, nz = cell_list.ncells
    ncells = cell_list.num_cells
    ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
    cell_caps = layout.cell_caps
    npres = len(layout.present)
    c = sum(cell_caps)
    cc = ncells * c
    kk = 27 * c

    inv = jnp.linalg.inv(box)
    frac = positions @ inv
    wrap_f = jnp.floor(frac)
    wrap_shift = wrap_f @ box
    frac = frac - wrap_f
    cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0, ncells_arr - 1)
    cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]

    # Species-sub-blocked slot assignment: sort by (cell, species), rank
    # within each (cell, species) segment.
    pres_table = np.full(layout.num_species + 1, npres, np.int32)
    for i, s in enumerate(layout.present):
        pres_table[s] = i
    sp_idx_np = pres_table[np.asarray(species, np.int32)]       # static
    key = cell_id * npres + jnp.asarray(sp_idx_np)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    idx_n = jnp.arange(n, dtype=jnp.int32)
    new_seg = jnp.concatenate([jnp.ones((1,), bool),
                               sorted_key[1:] != sorted_key[:-1]])
    seg_start = jax.lax.cummax(jnp.where(new_seg, idx_n, 0))
    rank_sorted = idx_n - seg_start
    cell_sorted = sorted_key // npres
    sp_sorted = sorted_key % npres
    caps_arr = jnp.asarray(np.asarray(cell_caps, np.int32))
    offs_np = np.cumsum((0,) + cell_caps)[:-1].astype(np.int32)
    offs_arr = jnp.asarray(offs_np)
    slot_of_sorted = jnp.where(
        rank_sorted < caps_arr[sp_sorted],
        cell_sorted * c + offs_arr[sp_sorted] + rank_sorted, cc + 1)

    seg_counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), key,
                                     num_segments=ncells * npres)
    cell_sp_counts = seg_counts.reshape(ncells, npres)
    max_cell_sp = jnp.max(cell_sp_counts, axis=0)
    occupancy = jnp.sum(cell_sp_counts, axis=1)
    max_occ = jnp.max(occupancy)

    # Cell-occupancy classes: big cells (any species beyond small_caps)
    # sort to the front of the frozen permutation.
    if layout.small_caps is not None:
        is_big = jnp.any(cell_sp_counts > jnp.asarray(layout.small_caps),
                         axis=1)
        cell_perm = jnp.argsort(~is_big, stable=True).astype(jnp.int32)
        n_big_true = jnp.sum(is_big.astype(jnp.int32))
    else:
        cell_perm = jnp.arange(ncells, dtype=jnp.int32)
        n_big_true = jnp.zeros((), jnp.int32)

    p_w = positions - wrap_shift
    pos_sorted = p_w[order]
    pos_slots = jnp.full((cc, 3), FAR, positions.dtype)
    pos_slots = pos_slots.at[slot_of_sorted].set(pos_sorted, mode='drop')

    f27_np, stencil_np, _ = _window_tables((nx, ny, nz))
    stencil = jnp.asarray(stencil_np)
    shift27 = jnp.asarray(f27_np) @ box                     # [ncells, 27, 3]
    shift_parts = [jnp.repeat(shift27.transpose(2, 0, 1), cs, axis=2)
                   for cs in cell_caps]
    shift_planes = jnp.concatenate(shift_parts, axis=2)     # [3, cells, kk]

    # Species-major candidate windows (per-species stencil expansion of the
    # global slot planes' static species sub-columns).
    planes = pos_slots.T.reshape(3, ncells, c)
    wins = []
    for i, cs in enumerate(cell_caps):
        sub = planes[:, :, offs_np[i]:offs_np[i] + cs]
        wins.append(_make_stencil_window((nx, ny, nz), cs)(sub))
    cand_cells = jnp.concatenate(wins, axis=2) + shift_planes
    cand_pos = cand_cells.transpose(1, 0, 2)[cell_sorted]   # [N, 3, kk]
    dx = cand_pos[:, 0, :] - pos_sorted[:, 0:1]
    dy = cand_pos[:, 1, :] - pos_sorted[:, 1:2]
    dz = cand_pos[:, 2, :] - pos_sorted[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz

    entry_np, slotoff_np = _lane_tables(cell_caps)
    cand_slot = (stencil[:, jnp.asarray(entry_np)] * c
                 + jnp.asarray(slotoff_np))                 # [ncells, kk]
    cand_slot_atom = cand_slot[cell_sorted]
    not_self = cand_slot_atom != slot_of_sorted[:, None]
    skin = cell_list.cutoff - radial_cutoff
    ang_window = angular_cutoff + max(skin, 0.0)
    valid_ang = (d2 < ang_window * ang_window) & not_self
    # Species per lane is static (species-major window): broadcast row.
    lane_sp_np = np.concatenate(
        [np.full(27 * cs, layout.present[i], np.int32)
         for i, cs in enumerate(cell_caps)])
    cand_sp_raw = jnp.broadcast_to(jnp.asarray(lane_sp_np)[None, :], (n, kk))

    a_layout = ang_as_rad_layout(layout)
    bsel = _compact_blocked(n, cc, a_layout, valid_ang, valid_ang,
                            cand_sp_raw, cand_slot_atom, order,
                            slot_of_sorted, idx_n, max_occ)
    return WindowSelection(ang=bsel, shift_planes=shift_planes,
                           wrap_shift=wrap_shift, max_cell_sp=max_cell_sp,
                           cell_perm=cell_perm, n_big_true=n_big_true)


def window_features(cell_list: CellList, positions: Array, box: Array,
                    wsel: WindowSelection, basis, layout: BlockedLayout,
                    row_order: Optional[Array] = None,
                    interpret: Optional[bool] = None) -> Array:
    """Full AEV [N, aev_length] (reference layout: radial [S*R] ‖ angular
    [P*A], SymmetryFunctions.py:120-122) for window mode, differentiable in
    ``positions``. ``row_order`` as in ``payload_from_blocked``."""
    from ..ops.pallas_aev import angular_aev_pallas
    sel = wsel.ang
    n = positions.shape[0]
    ncells = cell_list.num_cells
    cell_caps = layout.cell_caps
    c = sum(cell_caps)
    cc = ncells * c
    a_layout = ang_as_rad_layout(layout)

    # --- Angular: compacted-lane payload (mirror-adjoint gather) + the
    # fused Pallas angular kernel, all shared with the blocked path.
    pay = payload_from_blocked(cell_list, positions, box, sel,
                               rad_only=True, row_order=row_order)
    angular = angular_aev_pallas(pay.rad_deltas, pay.ang_mask, basis,
                                 a_layout, interpret=interpret,
                                 rad_width=pay.rad_deltas.shape[2])

    # --- Radial: dense per-cell window kernel, capacity-free.
    p_w = positions - wsel.wrap_shift
    pos_sorted = p_w[sel.order]
    slots = jnp.full((cc, 3), FAR, positions.dtype)
    slots = slots.at[sel.slot_of_sorted].set(pos_sorted, mode='drop')
    planes = slots.T.reshape(3, ncells, c)
    offs = np.cumsum((0,) + cell_caps)[:-1]
    wins = []
    for i, cs in enumerate(cell_caps):
        sub = planes[:, :, int(offs[i]):int(offs[i]) + cs]
        wins.append(_make_stencil_window(cell_list.ncells, cs)(sub))
    win = jnp.concatenate(wins, axis=2) + wsel.shift_planes
    centers = slots.reshape(ncells, c, 3)
    npres = len(layout.present)
    num_r = basis.num_radial
    if layout.small_caps is None or layout.num_big_cells is None:
        rad_slots = window_radial_aev(
            win[0], win[1], win[2], centers,
            basis.radial_cutoff, basis.radial_eta, basis.radial_rs,
            cell_caps, basis.torchani, interpret=interpret)
    else:
        # Cell-occupancy bucketing: big cells (frozen permutation front)
        # run at full center rows, the rest with species-packed rows.
        perm = wsel.cell_perm
        nb = layout.num_big_cells
        sc = layout.small_caps
        winp = win[:, perm]                    # [3, ncells, kk] coarse
        ctrp = centers[perm]
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
        inv_perm = jnp.zeros((ncells,), jnp.int32).at[perm].set(
            jnp.arange(ncells, dtype=jnp.int32))
        rad_slots = rad_perm[inv_perm]                 # coarse row gather
    rad_flat = rad_slots.reshape(cc, npres * num_r)
    io = sel.inv_order if row_order is None else row_order
    row_slots = jnp.minimum(sel.slot_of_sorted[io], cc - 1)
    radial_rows = rad_flat[row_slots]                       # [N, P*R]
    pieces = []
    for s in range(basis.num_species):
        if s in layout.present:
            i = layout.present.index(s)
            pieces.append(radial_rows[:, i * num_r:(i + 1) * num_r])
        else:
            pieces.append(jnp.zeros((n, num_r), radial_rows.dtype))
    radial_full = jnp.concatenate(pieces, axis=1)           # [N, S*R]
    return jnp.concatenate([radial_full, angular], axis=1)
