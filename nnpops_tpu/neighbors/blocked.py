"""Species-blocked static neighbor slots (TPU-first AEV data layout).

The reference scatters per-pair contributions into per-species (radial) and
per-species-pair (angular) accumulators with atomics keyed on runtime species
lookups (CpuANISymmetryFunctions.cpp:141-147, :183-190;
CudaANISymmetryFunctions.cu:223, :286). Round-1 of this rebuild expressed the
same scatter as one-hot MXU contractions — measured at ~2% MXU utilization
(NOTES_PERF.md), the dominant cost of the 26k-atom step.

This module removes the species machinery from the per-step path entirely:
each atom's neighbor list is packed into **static per-species lane ranges**
(species s occupies lanes ``[off_s, off_s + K_s)``), so the species of every
lane is known at trace time. The per-species radial reduction and the
per-species-pair angular reduction then become *static slice sums* — no
one-hot operands, no species table lookups, no per-step compaction sort:

* the per-species compaction keys are sorted once per selection refresh
  (Verlet-skin sticky stepping, like SlotSelection);
* the angular sub-list (neighbors within the angular cutoff + skin) is ALSO
  frozen per refresh, killing the per-step [N, K] distance sort of the
  round-1 pipeline;
* the per-step work is exactly: one packed payload gather + pure elementwise
  math + static reductions.

Capacity overflow stays observable data, per species (``max_rad``/``max_ang``
vs the layout capacities) — the ``number_found_pairs`` soft-failure contract
(getNeighborPairs.py:77-83) extended per species block.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import box_transform, minimum_image
from .cell_list import CellList

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class BlockedLayout:
    """Static per-species lane layout of a blocked neighbor list.

    present: species ids that occur in the system (static — an MD system's
      species assignment never changes; absent species get zero lanes).
    rad_caps / ang_caps: per-present-species lane counts for the radial
      (full-cutoff) and angular (angular-cutoff) neighbor lists.
    """
    num_species: int
    present: Tuple[int, ...]
    rad_caps: Tuple[int, ...]
    ang_caps: Tuple[int, ...]
    # Window-mode extras (None unless planned for aev_impl='window'):
    # per-present-species cell-slot capacities (cell blocks are species-
    # sub-blocked: species i occupies slot ranks [sum(cell_caps[:i]),
    # sum(cell_caps[:i+1])) of its cell) and the planned cell grid.
    cell_caps: Optional[Tuple[int, ...]] = None
    cell_grid: Optional[Tuple[int, int, int]] = None
    # Cell-occupancy bucketing: cells whose per-species occupancy fits
    # small_caps run the radial kernel with packed center rows; at most
    # num_big_cells cells may exceed it (soft-failure contract otherwise).
    # None disables the split (every cell processed at cell_caps rows).
    small_caps: Optional[Tuple[int, ...]] = None
    num_big_cells: Optional[int] = None
    # Angular row tiering (window mode): tier 0 runs the full ang_caps
    # triple table; each further tier t >= 1 has smaller per-species caps
    # ang_tier_caps[t-1] (nested: caps[t] <= caps[t-1] elementwise) and a
    # quadratically smaller triple table. A row runs in the smallest tier
    # whose caps hold its per-species angular counts. ang_tier_rows[t][i]
    # is the planned static row capacity of tier t (t < ntiers-1) for
    # center-species present[i]; the LAST tier takes the remaining rows.
    # Exceeding a planned capacity is a reported soft failure. None
    # disables tiering.
    ang_tier_caps: Optional[Tuple[Tuple[int, ...], ...]] = None
    ang_tier_rows: Optional[Tuple[Tuple[int, ...], ...]] = None
    # Dedicated ANGULAR cell grid (window mode): the per-refresh angular
    # candidate/compaction pipeline runs on cells sized by the (much
    # smaller) angular window instead of the radial cutoff — the [N, 27c]
    # candidate tensor shrinks ~2.5x at ANI cutoffs. None = share the
    # radial grid (the radial kernel itself never needs these).
    ang_cell_caps: Optional[Tuple[int, ...]] = None
    ang_cell_grid: Optional[Tuple[int, int, int]] = None
    # Cluster-pair radial plan (radial_impl='cluster'): species-pure
    # 8-atom clusters with compacted j-cluster lists replace the dense
    # 27-cell window for the radial kernel (neighbors.clusters).
    cluster_plan: Optional[object] = None

    def __post_init__(self):
        if not (len(self.present) == len(self.rad_caps) == len(self.ang_caps)):
            raise ValueError('present/rad_caps/ang_caps must align')
        if self.cell_caps is not None and len(self.cell_caps) != len(self.present):
            raise ValueError('cell_caps must align with present')

    @property
    def rad_total(self) -> int:
        return int(sum(self.rad_caps))

    @property
    def ang_total(self) -> int:
        return int(sum(self.ang_caps))

    @property
    def rad_offsets(self) -> Tuple[int, ...]:
        return tuple(int(x) for x in np.cumsum((0,) + self.rad_caps)[:-1])

    @property
    def ang_offsets(self) -> Tuple[int, ...]:
        return tuple(int(x) for x in np.cumsum((0,) + self.ang_caps)[:-1])


def plan_blocked_layout(positions, box, species, radial_cutoff: float,
                        angular_cutoff: float, num_species: int,
                        margin: float = 1.2,
                        lane_multiple: int = 1) -> BlockedLayout:
    """Size a BlockedLayout from true per-species neighbor counts.

    Host-side, one-time (like ``native.plan_capacities``): exact max
    per-species neighbor counts for this configuration, scaled by ``margin``.
    ``lane_multiple`` rounds each species block up (e.g. 8 for sublane
    alignment in the Pallas kernels).
    """
    species = np.asarray(species)
    present = tuple(int(s) for s in np.unique(species))
    counts_r, counts_a = per_species_neighbor_counts(
        positions, box, species, present, radial_cutoff, angular_cutoff)

    def size(c):
        c = int(np.ceil(c * margin)) + 1
        return int(-(-c // lane_multiple) * lane_multiple)

    return BlockedLayout(num_species=num_species, present=present,
                         rad_caps=tuple(size(c) for c in counts_r),
                         ang_caps=tuple(size(c) for c in counts_a))


def per_species_neighbor_counts(positions, box, species, present,
                                radial_cutoff: float, angular_cutoff: float,
                                ) -> Tuple[np.ndarray, np.ndarray]:
    """True max per-species neighbor counts (radial & angular windows).

    Cell-binned O(N) host pass (numpy); used by the layout planner and by
    overflow re-planning.
    """
    positions = np.asarray(positions, np.float64)
    species = np.asarray(species)
    n = len(positions)
    rc = float(radial_cutoff)
    if box is not None:
        b = np.asarray(box, np.float64)
        widths = 1.0 / np.linalg.norm(np.linalg.inv(b), axis=0)
        nc = np.maximum((widths // rc).astype(int), 1)
        if (nc < 3).any():
            nc = np.array([1, 1, 1])
    else:
        b = None
        nc = np.array([1, 1, 1])
    ncell = int(np.prod(nc))
    if ncell == 1:
        cell_of = np.zeros(n, np.int64)
        cells = {0: np.arange(n)}
        stencil = {0: [0]}
    else:
        inv = np.linalg.inv(b)
        frac = positions @ inv
        frac -= np.floor(frac)
        c3 = np.minimum((frac * nc).astype(int), nc - 1)
        cell_of = (c3[:, 0] * nc[1] + c3[:, 1]) * nc[2] + c3[:, 2]
        cells = {}
        order = np.argsort(cell_of, kind='stable')
        bounds = np.searchsorted(cell_of[order], np.arange(ncell + 1))
        for c in range(ncell):
            cells[c] = order[bounds[c]:bounds[c + 1]]
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
    sp_index = {s: i for i, s in enumerate(present)}
    counts_r = np.zeros(len(present), np.int64)
    counts_a = np.zeros(len(present), np.int64)
    ra2 = float(angular_cutoff) ** 2
    rc2 = rc * rc
    for c, atoms in cells.items():
        if len(atoms) == 0:
            continue
        cand = np.concatenate([cells[q] for q in stencil[c]])
        delta = positions[cand][None, :, :] - positions[atoms][:, None, :]
        if b is not None:
            delta = delta - np.round(delta[..., 2:3] / b[2, 2]) * b[2]
            delta = delta - np.round(delta[..., 1:2] / b[1, 1]) * b[1]
            delta = delta - np.round(delta[..., 0:1] / b[0, 0]) * b[0]
        d2 = (delta ** 2).sum(-1)
        d2[atoms[:, None] == cand[None, :]] = np.inf
        sp_cand = species[cand]
        for s in present:
            m = sp_cand == s
            i = sp_index[s]
            counts_r[i] = max(counts_r[i], int((d2[:, m] < rc2).sum(1).max()))
            counts_a[i] = max(counts_a[i], int((d2[:, m] < ra2).sum(1).max()))
    return counts_r, counts_a


class BlockedSelection(NamedTuple):
    """A frozen species-blocked neighbor selection (cell-slot space).

    Reusable across MD steps while no atom has moved more than half the skin
    (build the CellList with cutoff + skin) — the Verlet contract, same as
    SlotSelection, plus a frozen angular sub-list.
    """
    order: Array           # [N] cell-sorted atom order at freeze time
    slot_of_sorted: Array  # [N] slot id per sorted atom (cc+1 = dropped)
    inv_order: Array       # [N] sorted position of each original atom
    slot_to_atom: Array    # [cc+1] original atom id per slot (N = empty)
    nbr_rad: Array         # [N, rad_total] neighbor slot ids (cc = pad)
    rad_mask: Array        # [N, rad_total]
    nbr_ang: Array         # [N, ang_total]
    ang_mask: Array        # [N, ang_total]
    max_rad: Array         # [n_present] true per-species radial counts
    max_ang: Array         # [n_present] true per-species angular counts
    max_cell_occupancy: Array
    # mirror[a, l] = flat index (row * (rad+ang) + lane) of the REVERSE
    # directed entry of (a, l) — entry (j -> i) for entry (i -> j). Lets the
    # payload-gather adjoint run as a frozen GATHER instead of an XLA
    # scatter-add (measured ~5x slower on TPU). Sentinel N*(rad+ang) = none.
    mirror: Array          # [N, rad_total + ang_total] int32
    # ang_in_rad[a, l] = lane position of angular neighbor l inside atom a's
    # RADIAL lane list (the angular list is a subsequence of the radial list
    # whenever no capacity overflowed: same species blocks, same slot-id
    # ascending order, angular window inside the radial window). Lets the
    # fused kernel extract the angular payload from the radial payload in
    # VMEM, so the per-step gather only fetches radial lanes.
    # Sentinel rad_total = invalid.
    ang_in_rad: Array      # [N, ang_total] int32

    def did_overflow(self, layout: BlockedLayout, cell_capacity: int) -> Array:
        rad_over = jnp.any(self.max_rad > jnp.asarray(layout.rad_caps))
        ang_over = jnp.any(self.max_ang > jnp.asarray(layout.ang_caps))
        return (rad_over | ang_over
                | (self.max_cell_occupancy > cell_capacity))


class BlockedPayload(NamedTuple):
    """Per-step differentiable payload for the blocked lists.

    All arrays in ORIGINAL atom order; padding lanes hold exact zeros.
    Lane ranges follow the BlockedLayout (species of each lane is static).

    Deltas are stored as COORDINATE PLANES ``[3, N, K]`` (x/y/z-major), not
    ``[N, K, 3]``: TPU tiling pads the two minor dims to (8, 128), so a
    trailing length-3 axis pays ~42x memory traffic on every pass that
    touches it (measured — NOTES_PERF.md "THE layout discovery"). With the
    plane layout every elementwise pass, every kernel input read, and the
    mirror-adjoint path run on dense ``[N, K]`` tiles.
    """
    rad_deltas: Array      # [3, N, rad_total] coordinate planes
    rad_r: Array           # [N, rad_total]
    rad_mask: Array        # [N, rad_total]
    ang_deltas: Optional[Array]    # [3, N, ang_total]; None in rad-only mode
    ang_r: Optional[Array]         # [N, ang_total]
    ang_mask: Array        # [N, ang_total]
    max_rad: Array
    max_ang: Array
    max_cell_occupancy: Array
    # Rad-only mode: frozen lane positions of the angular neighbors inside
    # the radial lanes (the fused kernel extracts them in VMEM).
    ang_in_rad: Optional[Array] = None   # [N, ang_total] int32


def select_blocked(cell_list: CellList, positions: Array, box: Array,
                   species: np.ndarray, layout: BlockedLayout,
                   radial_cutoff: float, angular_cutoff: float,
                   ) -> BlockedSelection:
    """Freeze a species-blocked neighbor selection.

    The cell list's cutoff may exceed ``radial_cutoff`` by a Verlet skin; the
    angular sub-list window is widened by the same skin so both lists stay
    valid until any atom moves half the skin.

    Everything here runs under ``stop_gradient`` (selection is a discrete
    choice; gradients flow only through the payload phase).
    """
    positions = jax.lax.stop_gradient(positions)
    box = jax.lax.stop_gradient(box)
    n = positions.shape[0]
    if not cell_list.use_cells:
        return _select_blocked_dense(cell_list, positions, box, species,
                                     layout, radial_cutoff, angular_cutoff)
    nx, ny, nz = cell_list.ncells
    ncells = cell_list.num_cells
    ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
    inv = jnp.linalg.inv(box)
    frac = box_transform(positions, inv)
    frac = frac - jnp.floor(frac)
    cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0, ncells_arr - 1)
    cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]

    order = jnp.argsort(cell_id, stable=True)
    sorted_ids = cell_id[order]
    idx_n = jnp.arange(n, dtype=jnp.int32)
    new_seg = jnp.concatenate([jnp.ones((1,), bool),
                               sorted_ids[1:] != sorted_ids[:-1]])
    seg_start = jax.lax.cummax(jnp.where(new_seg, idx_n, 0))
    rank_sorted = idx_n - seg_start
    occupancy = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), cell_id,
                                    num_segments=ncells)
    max_occ = jnp.max(occupancy)

    c = cell_list.cell_capacity
    cc = ncells * c
    slot_of_sorted = jnp.where(rank_sorted < c,
                               sorted_ids * c + rank_sorted, cc + 1)
    pos_sorted = positions[order]
    pos_slots = jnp.zeros((cc, 3), positions.dtype)
    pos_slots = pos_slots.at[slot_of_sorted].set(pos_sorted, mode='drop')
    present_slots = jnp.zeros((cc,), bool).at[slot_of_sorted].set(
        True, mode='drop')
    # Species per slot (int32; padding slots get num_species).
    sp_sorted = jnp.asarray(np.asarray(species, np.int32))[order]
    sp_slots = jnp.full((cc,), layout.num_species, jnp.int32)
    sp_slots = sp_slots.at[slot_of_sorted].set(sp_sorted, mode='drop')

    stencil = jnp.asarray(cell_list._stencil())            # [cells, 27]
    kk = 27 * c
    cand_slot = (stencil[:, :, None] * c
                 + jnp.arange(c, dtype=jnp.int32)).reshape(ncells, kk)
    # Coarse block gathers (cell neighborhoods), large axis last — see
    # CellList.select for the layout rationale.
    cand_pos_cells = pos_slots.reshape(ncells, c, 3)[stencil]
    cand_pos_cells = cand_pos_cells.reshape(ncells, kk, 3).transpose(0, 2, 1)
    present_cells = present_slots.reshape(ncells, c)[stencil].reshape(ncells, kk)
    sp_cells = sp_slots.reshape(ncells, c)[stencil].reshape(ncells, kk)

    cand_pos = cand_pos_cells[sorted_ids]                  # [N, 3, kk]
    cand_present = present_cells[sorted_ids]               # [N, kk]
    cand_sp = sp_cells[sorted_ids]                         # [N, kk]
    cand_slot_atom = cand_slot[sorted_ids]                 # [N, kk]

    delta = cand_pos - pos_sorted[:, :, None]
    dx, dy, dz = delta[:, 0, :], delta[:, 1, :], delta[:, 2, :]
    s3 = jnp.round(dz / box[2, 2])
    dx = dx - s3 * box[2, 0]
    dy = dy - s3 * box[2, 1]
    dz = dz - s3 * box[2, 2]
    s2 = jnp.round(dy / box[1, 1])
    dx = dx - s2 * box[1, 0]
    dy = dy - s2 * box[1, 1]
    dx = dx - jnp.round(dx / box[0, 0]) * box[0, 0]
    d2 = dx * dx + dy * dy + dz * dz
    not_self = cand_slot_atom != slot_of_sorted[:, None]
    skin = cell_list.cutoff - radial_cutoff
    valid = cand_present & (d2 < cell_list.cutoff ** 2) & not_self
    ang_window = angular_cutoff + max(skin, 0.0)
    valid_ang = cand_present & (d2 < ang_window * ang_window) & not_self

    return _compact_blocked(n, cc, layout, valid, valid_ang, cand_sp,
                            cand_slot_atom, order, slot_of_sorted, idx_n,
                            max_occ)


def _build_mirror(slot_rows: Array, nbr: Array, mask: Array, cc: int) -> Array:
    """Flat index of each directed entry's reverse copy.

    The lists are directed-symmetric (if j is listed by i, i is listed by j —
    cutoff and presence are symmetric), so sorting all valid entries once by
    (own slot, neighbor slot) and once by (neighbor slot, own slot) aligns
    every entry with its mirror at the same sorted position. Atoms dropped by
    cell overflow break symmetry; their entries are excluded (the selection
    is already 'incomplete, re-plan' per the overflow contract).
    """
    n, k = nbr.shape
    flat = jnp.arange(n * k, dtype=jnp.int32)
    s1 = jnp.broadcast_to(slot_rows[:, None], (n, k)).reshape(-1)
    s2 = nbr.reshape(-1)
    valid = mask.reshape(-1) & (s1 <= cc)
    base = cc + 2
    if base * base < 2 ** 32:
        # Pack both keys into one uint32 — a single-key 2-operand sort is
        # ~1/3 cheaper than the 3-operand 2-key variant at this size.
        p1 = s1.astype(jnp.uint32) * np.uint32(base) + s2.astype(jnp.uint32)
        p2 = s2.astype(jnp.uint32) * np.uint32(base) + s1.astype(jnp.uint32)
        big = jnp.uint32(2 ** 32 - 1)
        _, v1 = jax.lax.sort([jnp.where(valid, p1, big), flat], num_keys=1)
        _, v2 = jax.lax.sort([jnp.where(valid, p2, big), flat], num_keys=1)
    else:
        big = jnp.int32(base)
        k1a = jnp.where(valid, s1, big)
        k1b = jnp.where(valid, s2, big)
        k2a = jnp.where(valid, s2, big)
        k2b = jnp.where(valid, s1, big)
        _, _, v1 = jax.lax.sort([k1a, k1b, flat], num_keys=2)
        _, _, v2 = jax.lax.sort([k2a, k2b, flat], num_keys=2)
    # mirror[v1[i]] = v2[i]; v1 is a full permutation, so a third key-value
    # sort IS the scatter (a flat .at[v1].set(v2) pays gather-like per-row
    # latency; a sort pass is dense — window._mirror_packed, same trick).
    _, mirror = jax.lax.sort([v1, v2], num_keys=1)
    mirror = jnp.where(mask.reshape(-1), mirror, n * k)
    return mirror.reshape(n, k)


def _compact_blocked(n, cc, layout, valid, valid_ang, cand_sp,
                     cand_slot_atom, order, slot_of_sorted, idx_n, max_occ,
                     rad_only_mirror=False):
    """Shared per-species packed-key compaction (cell and dense paths).

    Two-stage: ONE wide packed sort compacts all valid candidates (slot id
    major; species index and the angular-window bit ride the low bits) to a
    narrow ``K1 = rad_total`` front block, then the per-(species, rad|ang)
    static-lane compactions sort only that narrow block. At production
    sizes (candidate width ~1000, K1 ~100) this costs ~1 wide + 4 narrow
    sorts instead of 4 wide ones.

    Correctness of the K1 truncation: a row can only lose valid candidates
    if its total count exceeds Sum_s caps_s, which requires at least one
    species over its cap — exactly the condition ``did_overflow`` reports
    (computed from the full-width masks below, before truncation).
    """
    npres = len(layout.present)
    sp_table = np.full(layout.num_species + 1, npres, np.int32)
    for i, s in enumerate(layout.present):
        sp_table[s] = i
    sp_idx = jnp.asarray(sp_table)[cand_sp]                     # [N, kk]

    max_rad, max_ang = [], []
    for i, s in enumerate(layout.present):
        is_s = sp_idx == i
        max_rad.append(jnp.max(jnp.sum((valid & is_s).astype(jnp.int32), 1)))
        max_ang.append(jnp.max(jnp.sum((valid_ang & is_s).astype(jnp.int32),
                                       1)))

    kk = cand_slot_atom.shape[1]
    stride = 2 * (npres + 1)
    k1 = min(kk, -(-layout.rad_total // 8) * 8)
    big1 = jnp.int32(2 ** 31 - 1)
    if cc * stride + stride < 2 ** 31 - 1 and k1 < kk:
        packed = (cand_slot_atom * stride + sp_idx * 2
                  + valid_ang.astype(jnp.int32))
        packed = jnp.where(valid, packed, big1)
        stage1 = jax.lax.sort(packed, dimension=1)[:, :k1]      # [N, K1]
        valid1 = stage1 < big1
        safe1 = jnp.where(valid1, stage1, 0)
        slot1 = safe1 // stride
        rem = safe1 % stride
        sp1 = rem // 2
        ang1 = (rem % 2) == 1
    else:                       # tiny candidate sets / giant slot spaces
        slot1 = cand_slot_atom
        sp1 = sp_idx
        ang1 = valid_ang
        valid1 = valid
    # Per-species compaction, ONE sort per species with an ANGULAR-FIRST
    # key: lanes order as [ang-window neighbors (slot asc) | other radial
    # neighbors (slot asc) | padding]. The angular sub-list is then exactly
    # the first ang_caps lanes of the species' radial block — no separate
    # angular sort, no lane matching, and consumers can slice the angular
    # payload straight out of the radial payload.
    base2 = cc + 2
    nbr_rad, rad_masks = [], []
    nbr_ang, ang_masks = [], []
    air = []
    krt = layout.rad_total
    for i, s in enumerate(layout.present):
        is_s = valid1 & (sp1 == i)
        key = jnp.where(is_s,
                        slot1 + jnp.where(ang1, 0, base2),
                        2 * base2 + cc)
        key = jax.lax.sort(key, dimension=1)[:, :layout.rad_caps[i]]
        is_ang = key < base2
        slot_s = jnp.where(is_ang, key, key - base2)
        m = key < 2 * base2
        nbr_rad.append(jnp.where(m, slot_s, cc))
        rad_masks.append(m)
        ac = layout.ang_caps[i]
        ro = layout.rad_offsets[i]
        nbr_ang.append(jnp.where(is_ang[:, :ac], slot_s[:, :ac], cc))
        ang_masks.append(is_ang[:, :ac])
        # Angular lane l of species block i sits at radial lane ro + l.
        air.append(jnp.where(is_ang[:, :ac],
                             jnp.arange(ro, ro + ac, dtype=jnp.int32)[None],
                             krt))

    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(idx_n, mode='drop')
    slot_to_atom = jnp.full((cc + 1,), n, jnp.int32)
    slot_to_atom = slot_to_atom.at[slot_of_sorted].set(
        order.astype(jnp.int32), mode='drop')
    nbr_rad_c = jnp.concatenate(nbr_rad, axis=1)
    rad_mask_c = jnp.concatenate(rad_masks, axis=1)
    nbr_ang_c = jnp.concatenate(nbr_ang, axis=1)
    ang_mask_c = jnp.concatenate(ang_masks, axis=1)
    ang_in_rad = jnp.concatenate(air, axis=1)
    # Mirror indices in the radial [N, Krt] flat lane space. The angular
    # lists are sub-lists of the radial lanes, so the radial mirror is the
    # only one any payload adjoint needs.
    slot32 = slot_of_sorted.astype(jnp.int32)
    kat = nbr_ang_c.shape[1]
    mr_c = _build_mirror(slot32, nbr_rad_c, rad_mask_c, cc)
    return BlockedSelection(
        order=order.astype(jnp.int32),
        slot_of_sorted=slot32,
        inv_order=inv_order, slot_to_atom=slot_to_atom,
        nbr_rad=nbr_rad_c, rad_mask=rad_mask_c,
        nbr_ang=nbr_ang_c, ang_mask=ang_mask_c,
        max_rad=jnp.stack(max_rad), max_ang=jnp.stack(max_ang),
        max_cell_occupancy=max_occ,
        mirror=mr_c,
        ang_in_rad=ang_in_rad)


def _select_blocked_dense(cell_list: CellList, positions, box, species,
                          layout, radial_cutoff, angular_cutoff):
    """Degenerate single-cell path (small/nonperiodic systems): every atom is
    a candidate of every other; slots are just atom ids (cc = n)."""
    n = positions.shape[0]
    cc = n
    delta = positions[None, :, :] - positions[:, None, :]
    delta = minimum_image(delta, box)
    d2 = jnp.sum(delta * delta, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    skin = cell_list.cutoff - radial_cutoff
    valid = (d2 < cell_list.cutoff ** 2) & ~eye
    ang_window = angular_cutoff + max(skin, 0.0)
    valid_ang = (d2 < ang_window * ang_window) & ~eye
    cand_sp = jnp.broadcast_to(
        jnp.asarray(np.asarray(species, np.int32))[None, :], (n, n))
    cand_slot_atom = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], (n, n))
    idx_n = jnp.arange(n, dtype=jnp.int32)
    return _compact_blocked(n, cc, layout, valid, valid_ang, cand_sp,
                            cand_slot_atom, idx_n, idx_n, idx_n,
                            jnp.asarray(n, jnp.int32))


@jax.custom_vjp
def _gather_slots_mirror(slots, idx, mirror, mask, slot_of_sorted):
    """``slots[idx]`` as coordinate planes ``[3, n, kb]``, whose VJP runs as
    a frozen GATHER via the mirror list instead of an XLA scatter-add
    (measured ~5x slower at 26k atoms): the cotangents destined for atom i's
    slot are exactly the cotangents of the reverse directed entries of i's
    own lanes. The single 12-byte-row gather (row count is what costs —
    ~3-5 ns/row regardless of width) is transposed straight into dense
    ``[3, n, kb]`` planes so no downstream pass touches a lane-padded
    ``[n, kb, 3]`` layout."""
    n, kb = idx.shape
    return slots[idx.reshape(-1)].reshape(n, kb, 3).transpose(2, 0, 1)


def _gather_slots_mirror_fwd(slots, idx, mirror, mask, slot_of_sorted):
    out = _gather_slots_mirror(slots, idx, mirror, mask, slot_of_sorted)
    return out, (mirror, mask, slot_of_sorted, slots.shape[0], idx.shape)


def _gather_slots_mirror_bwd(res, g):
    # g: [3, n, kb] planes.
    mirror, mask, slot_of_sorted, n_slots, (n, kb) = res
    g_flat = jnp.concatenate(
        [g.transpose(1, 2, 0).reshape(n * kb, 3),
         jnp.zeros((1, 3), g.dtype)], axis=0)
    gm = g_flat[mirror.reshape(-1)].reshape(n, kb, 3).transpose(2, 0, 1)
    gm = jnp.where(mask[None], gm, 0.0)
    per_atom = jnp.sum(gm, axis=2)                       # [3, n]
    d_slots = jnp.zeros((n_slots, 3), g.dtype)
    d_slots = d_slots.at[slot_of_sorted].set(per_atom.T, mode='drop')
    return (d_slots, None, None, None, None)


_gather_slots_mirror.defvjp(_gather_slots_mirror_fwd, _gather_slots_mirror_bwd)


def payload_from_blocked(cell_list: CellList, positions: Array, box: Array,
                         sel: BlockedSelection,
                         mirror_vjp: bool = True,
                         rad_only: bool = False,
                         layout: Optional[BlockedLayout] = None,
                         row_order: Optional[Array] = None,
                         num_slots: Optional[int] = None,
                         ) -> BlockedPayload:
    """The differentiable per-step phase: re-scatter current positions into
    the frozen slots, fetch neighbor positions with ONE packed gather of the
    RADIAL lanes, recompute deltas/distances. The angular lanes are the
    leading sub-block of each species' radial block (angular-first lane
    order, see ``_compact_blocked``), so the angular payload is just static
    slices of the radial payload — never gathered separately.

    ``mirror_vjp``: route the gather's adjoint through the frozen mirror
    list (gather) instead of XLA's scatter-add. Requires no capacity
    overflow (list symmetry) — which the overflow contract already demands.

    ``rad_only``: skip materializing the angular slices (``ang_deltas`` /
    ``ang_r`` = None); consumers slice the radial payload themselves (the
    fused Pallas kernel does, in VMEM).

    ``layout``: required when ``rad_only=False`` (slice boundaries).

    ``row_order``: internal (cell-sorted) row index per output row; defaults
    to ``sel.inv_order`` (original atom order). Passing a composed
    permutation (e.g. species-grouped) makes every payload row — and hence
    every AEV row — emerge directly in that order, so downstream consumers
    (the species-blocked ensemble) need no per-step row gather of their own.
    """
    n = positions.shape[0]
    pos_sorted = positions[sel.order]
    if cell_list.use_cells or num_slots is not None:
        cc = (num_slots if num_slots is not None
              else cell_list.num_cells * cell_list.cell_capacity)
        slots = jnp.zeros((cc + 1, 3), positions.dtype)
        slots = slots.at[sel.slot_of_sorted].set(pos_sorted, mode='drop')
    else:
        slots = jnp.concatenate(
            [pos_sorted, jnp.zeros((1, 3), positions.dtype)], axis=0)
    idx = sel.nbr_rad
    if mirror_vjp:
        gathered = _gather_slots_mirror(slots, idx, sel.mirror, sel.rad_mask,
                                        sel.slot_of_sorted)
    else:
        gathered = slots[idx.reshape(-1)].reshape(
            n, idx.shape[1], 3).transpose(2, 0, 1)

    # Plane-wise minimum image (same sequential row reduction as
    # select_blocked; assumes a reduced triclinic box, enforced by
    # validate_box at the API boundaries).
    dx = gathered[0] - pos_sorted[:, 0:1]
    dy = gathered[1] - pos_sorted[:, 1:2]
    dz = gathered[2] - pos_sorted[:, 2:3]
    if box is not None:
        s3 = jnp.round(dz / box[2, 2])
        dx = dx - s3 * box[2, 0]
        dy = dy - s3 * box[2, 1]
        dz = dz - s3 * box[2, 2]
        s2 = jnp.round(dy / box[1, 1])
        dx = dx - s2 * box[1, 0]
        dy = dy - s2 * box[1, 1]
        dx = dx - jnp.round(dx / box[0, 0]) * box[0, 0]
    deltas = jnp.stack([dx, dy, dz])                     # [3, n, K]
    deltas = jnp.where(sel.rad_mask[None], deltas, 0.0)
    r = jnp.sqrt(jnp.where(sel.rad_mask,
                           dx * dx + dy * dy + dz * dz, 1.0))
    r = jnp.where(sel.rad_mask, r, 0.0)

    io = sel.inv_order if row_order is None else row_order
    rad_deltas, rad_r = deltas[:, io], r[io]
    ang_mask = sel.ang_mask[io]
    if rad_only:
        ang_deltas = ang_r = None
        ang_in_rad = sel.ang_in_rad[io]
    else:
        if layout is None:
            raise ValueError('layout required unless rad_only=True')
        ang_deltas = jnp.concatenate(
            [rad_deltas[:, :, ro:ro + ac]
             for ro, ac in zip(layout.rad_offsets, layout.ang_caps)], axis=2)
        ang_r = jnp.concatenate(
            [rad_r[:, ro:ro + ac]
             for ro, ac in zip(layout.rad_offsets, layout.ang_caps)], axis=1)
        ang_deltas = jnp.where(ang_mask[None], ang_deltas, 0.0)
        ang_r = jnp.where(ang_mask, ang_r, 0.0)
        ang_in_rad = None
    return BlockedPayload(
        rad_deltas=rad_deltas, rad_r=rad_r, rad_mask=sel.rad_mask[io],
        ang_deltas=ang_deltas, ang_r=ang_r, ang_mask=ang_mask,
        max_rad=sel.max_rad, max_ang=sel.max_ang,
        max_cell_occupancy=sel.max_cell_occupancy,
        ang_in_rad=ang_in_rad)


def build_blocked_payload(cell_list: CellList, positions: Array, box: Array,
                          species, layout: BlockedLayout,
                          radial_cutoff: float, angular_cutoff: float,
                          ) -> BlockedPayload:
    """Select + payload in one call (non-sticky stepping)."""
    sel = select_blocked(cell_list, positions, box, species, layout,
                         radial_cutoff, angular_cutoff)
    return payload_from_blocked(cell_list, positions, box, sel, layout=layout)
