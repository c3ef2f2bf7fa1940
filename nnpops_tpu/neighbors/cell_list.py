"""O(N) cell-list neighbor construction with static shapes.

The reference acknowledges its O(N^2) neighbor search as the scaling limit
("a voxel based algorithm would be more efficient",
CpuANISymmetryFunctions.cpp:114-116, CpuCFConv.cpp:100-102) but never builds
one. This module is that voxel algorithm, designed for XLA: every shape is
static (cells x capacity, atoms x 27*capacity candidates, atoms x K
neighbors), so the builder jits once and runs inside the MD step under
``lax.scan``. Overflow (cell capacity or neighbor capacity) is reported as
data, never as a shape change — the same soft-failure contract as
``getNeighborPairs`` (getNeighborPairs.py:77-83).

Works in fractional space so rectangular and reduced triclinic boxes share
one code path; cell counts are derived from the box's perpendicular widths so
a 27-cell stencil is always sufficient for the cutoff.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import box_transform, minimum_image, validate_box
from ..ops.compaction import compact_rows
from .pairs import MaskedPairs

Array = jnp.ndarray


class NeighborPayload(NamedTuple):
    """A neighbor list that carries its data (built by CellList.build_payload).

    All arrays are in original atom order, padded to capacity K with
    mask=False entries that hold exact zeros (grad-safe).
    """
    deltas: Array        # [N, K, 3] displacement to each neighbor (min-imaged)
    distances: Array     # [N, K]
    features: Optional[Array]   # [N, K, F] per-neighbor features, or None
    indices: Array       # [N, K] original neighbor atom indices (N = padding)
    mask: Array          # [N, K] bool
    max_neighbors: Array        # [] int32 (true count; > K means overflow)
    max_cell_occupancy: Array   # [] int32

    def did_overflow(self, capacity: int, cell_capacity: int) -> Array:
        return ((self.max_neighbors > capacity)
                | (self.max_cell_occupancy > cell_capacity))


def _dist_payload_sorted(p, box, order, slot_of_sorted, nbr_slot_k, mask,
                         mirror, inv_order, cc: int):
    return _make_dist_payload(int(cc))(p, box, order, slot_of_sorted,
                                       nbr_slot_k, mask, mirror, inv_order)


@functools.lru_cache(maxsize=32)
def _make_dist_payload(cc: int):
    """Distances-from-frozen-selection with the mirror-routed adjoint (see
    CellList.payload_distances_from_selection). Sorted-atom row space; no
    box cotangent (fixed-box MD — the generic payload_from_selection path
    keeps full AD box gradients)."""

    @jax.custom_vjp
    def dist_payload(p, box, order, slot_of_sorted, nbr_slot_k, mask,
                     mirror, inv_order):
        d, _ = _fwd_impl(p, box, order, slot_of_sorted, nbr_slot_k, mask)
        return d

    def _fwd_impl(p, box, order, slot_of_sorted, nbr_slot_k, mask):
        n, k = nbr_slot_k.shape
        pos_sorted = p[order]
        slots = jnp.zeros((cc + 1, 3), p.dtype)
        slots = slots.at[slot_of_sorted].set(pos_sorted, mode='drop')
        nbr = slots[nbr_slot_k.reshape(-1)].reshape(n, k, 3)
        deltas = minimum_image(nbr - pos_sorted[:, None, :], box)
        d = jnp.sqrt(jnp.where(mask, jnp.sum(deltas * deltas, axis=-1),
                               1.0))
        d = jnp.where(mask, d, 0.0)
        return d, deltas

    def _fwd(p, box, order, slot_of_sorted, nbr_slot_k, mask, mirror,
             inv_order):
        d, deltas = _fwd_impl(p, box, order, slot_of_sorted, nbr_slot_k,
                              mask)
        return d, (d, deltas, mask, mirror, inv_order)

    def _bwd(res, g):
        d, deltas, mask, mirror, inv_order = res
        n, k = d.shape
        tot = n * k
        live = mask & (d > 0.0)
        big_d = jnp.where(live, d, 1.0)
        u = deltas / big_d[..., None]
        dcot = jnp.where(live, g, 0.0)
        # Mirror apply = ONE single-key 2-array sort by the closed
        # involution (invalid entries -> self): sorted position q receives
        # dcot[mirror[q]] (window._make_tier_geometry 'sort').
        flat = dcot.reshape(-1)
        idx = jnp.arange(tot, dtype=jnp.int32)
        key = jnp.where(mask.reshape(-1) & (mirror.reshape(-1) < tot),
                        mirror.reshape(-1), idx)
        _, dm_flat = jax.lax.sort([key, flat], num_keys=1)
        dm = jnp.where(live, dm_flat.reshape(n, k), 0.0)
        rows = -jnp.sum((dcot + dm)[..., None] * u, axis=1)    # [N, 3]
        d_p = rows[inv_order]
        return (d_p,) + (None,) * 7

    dist_payload.defvjp(_fwd, _bwd)
    return dist_payload


class SlotSelection(NamedTuple):
    """A frozen neighbor selection in cell-slot space (all integer/static).

    Produced by :meth:`CellList.select`; consumed by
    :meth:`CellList.payload_from_selection`. Reusable across MD steps while
    no atom has moved more than half the skin since the selection was built
    (build the CellList with ``cutoff + skin``) — the Verlet-list contract.
    """
    order: Array           # [N] sorted-by-cell atom order at freeze time
    slot_of_sorted: Array  # [N] slot id per sorted atom (cc+1 = dropped)
    inv_order: Array       # [N] sorted position of each original atom
    slot_to_atom: Array    # [cc+1] original atom id per slot (N = empty)
    nbr_slot_k: Array      # [N, K] compacted neighbor slot ids (cc = pad)
    mask: Array            # [N, K] valid-pair mask at freeze time
    max_neighbors: Array
    max_cell_occupancy: Array
    # Optional [N, K] flat index of each directed entry's reverse copy
    # (N*K = invalid), built by select(build_mirror=True). Consumed by
    # payload_distances_from_selection's scatter-free position adjoint.
    mirror: Optional[Array] = None


class NeighborList(NamedTuple):
    """Per-atom directed neighbor list.

    indices: [N, K] int32, padded with the sentinel N.
    max_neighbors: [] int32 — the TRUE max neighbor count found; if it
      exceeds K, neighbors were dropped (check between scan segments, never
      inside the jitted step).
    max_cell_occupancy: [] int32 — TRUE max atoms/cell; > cell capacity means
      the candidate set was truncated.
    """
    indices: Array
    max_neighbors: Array
    max_cell_occupancy: Array

    def did_overflow(self, capacity: int, cell_capacity: int) -> Array:
        return ((self.max_neighbors > capacity)
                | (self.max_cell_occupancy > cell_capacity))


def _perpendicular_widths(box: np.ndarray) -> np.ndarray:
    """Distance between opposite faces of the unit cell along each fractional
    axis: fractional coordinate i is ``pos @ inv[:, i]``, so the plane spacing
    is 1 / ||column i of the inverse box||. (Row norms would overestimate the
    width along x for tilted boxes and let the 27-cell stencil miss
    neighbors.)"""
    inv = np.linalg.inv(np.asarray(box, dtype=np.float64))
    return 1.0 / np.linalg.norm(inv, axis=0)


@dataclasses.dataclass(frozen=True)
class CellList:
    """A static cell decomposition bound to one box geometry.

    Build once per system (host-side: cell counts must be static for XLA);
    call :meth:`build` every time positions change. The box may still be
    passed per-call with slightly different values (e.g. NPT fluctuations)
    as long as the cell decomposition stays valid.
    """
    cutoff: float
    ncells: Tuple[int, int, int]
    capacity: int            # max neighbors per atom (K)
    cell_capacity: int       # max atoms per cell (C)

    @classmethod
    def create(cls, box, cutoff: float, capacity: int,
               cell_capacity: Optional[int] = None,
               density_estimate: float = 0.1,
               validate: bool = True) -> 'CellList':
        """Size the decomposition for a box. Falls back to a degenerate
        single-cell list (= all-pairs) when the box is under 3 cells wide
        along an axis, where the 27-stencil would alias.

        ``validate`` enforces the reduced-form / half-box preconditions at
        this API boundary (the reference does the same at every entry,
        getNeighborPairsCPU.cpp:40-48) — a box that violates them would
        silently produce wrong minimum images downstream."""
        if validate:
            validate_box(box, cutoff)
        widths = _perpendicular_widths(box)
        ncells = np.maximum(np.floor(widths / cutoff).astype(int), 1)
        if (ncells < 3).any():
            ncells = np.array([1, 1, 1])
        if cell_capacity is None:
            box_np = np.asarray(box, dtype=np.float64)
            volume = abs(np.linalg.det(box_np))
            cell_volume = volume / int(np.prod(ncells))
            # Mean occupancy + ~4.5 sigma Poisson headroom: tight capacities
            # keep the candidate axis (27C) small — it scales every sort and
            # broadcast in build_payload — while overflow stays reported, not
            # silent (max_cell_occupancy).
            mean_occ = density_estimate * cell_volume
            cell_capacity = max(8, int(np.ceil(mean_occ + 4.5 * np.sqrt(mean_occ) + 2)))
            # Sublane-align the slot blocks (the window-radial kernel tiles
            # [capacity, 27*capacity] VMEM arrays; 8-multiples keep every
            # block aligned at a few extra reported-not-silent pad slots).
            cell_capacity = -(-cell_capacity // 8) * 8
        return cls(cutoff=float(cutoff), ncells=tuple(int(x) for x in ncells),
                   capacity=int(capacity), cell_capacity=int(cell_capacity))

    @property
    def num_cells(self) -> int:
        return int(np.prod(self.ncells))

    @property
    def use_cells(self) -> bool:
        return self.num_cells >= 27

    def _stencil(self) -> np.ndarray:
        """Flat cell ids of the 27-neighborhood for every cell, [cells, 27]."""
        nx, ny, nz = self.ncells
        cx, cy, cz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                 indexing='ij')
        offs = np.array(np.meshgrid([-1, 0, 1], [-1, 0, 1], [-1, 0, 1],
                                    indexing='ij')).reshape(3, 27).T
        ids = []
        for ox, oy, oz in offs:
            ids.append((((cx + ox) % nx) * ny + (cy + oy) % ny) * nz + (cz + oz) % nz)
        return np.stack(ids, axis=-1).reshape(self.num_cells, 27)

    def build(self, positions: Array, box: Array) -> NeighborList:
        """Construct the directed neighbor list. Fully jit-able."""
        n = positions.shape[0]
        if not self.use_cells:
            return self._build_dense(positions, box)

        nx, ny, nz = self.ncells
        ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
        inv = jnp.linalg.inv(box)
        frac = box_transform(positions, inv)
        frac = frac - jnp.floor(frac)
        cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0, ncells_arr - 1)
        cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]

        # Rank of each atom within its cell via one stable sort.
        order = jnp.argsort(cell_id, stable=True)
        sorted_ids = cell_id[order]
        first = jnp.searchsorted(sorted_ids, sorted_ids, side='left')
        rank_sorted = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
        occupancy = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), cell_id,
                                        num_segments=self.num_cells)
        max_occ = jnp.max(occupancy)

        # Scatter atoms into [cells * C] slots; overflow ranks drop.
        c = self.cell_capacity
        slots = jnp.full((self.num_cells * c,), n, dtype=jnp.int32)
        slot_idx = cell_id * c + rank
        slot_idx = jnp.where(rank < c, slot_idx, self.num_cells * c)  # drop
        slots = slots.at[slot_idx].set(jnp.arange(n, dtype=jnp.int32),
                                       mode='drop')
        cell_atoms = slots.reshape(self.num_cells, c)

        # Candidates: atoms of the 27 neighboring cells, [N, 27*C].
        stencil = jnp.asarray(self._stencil())            # [cells, 27]
        cand = cell_atoms[stencil[cell_id]].reshape(n, 27 * c)
        in_range = cand < n
        safe = jnp.where(in_range, cand, 0)
        delta = positions[safe] - positions[:, None, :]
        delta = minimum_image(delta, box)
        d2 = jnp.sum(delta * delta, axis=-1)
        valid = (in_range & (d2 < self.cutoff * self.cutoff)
                 & (cand != jnp.arange(n, dtype=jnp.int32)[:, None]))

        counts = jnp.sum(valid.astype(jnp.int32), axis=1)
        k = self.capacity
        take, kept_valid = compact_rows(valid, k)
        kept = jnp.where(kept_valid, jnp.take_along_axis(cand, take, axis=1), n)
        return NeighborList(kept.astype(jnp.int32), jnp.max(counts), max_occ)

    def build_payload(self, positions: Array, box: Array,
                      features: Optional[Array] = None,
                      ) -> 'NeighborPayload':
        """Build a neighbor list that CARRIES its data (deltas + per-neighbor
        features) instead of bare indices.

        TPU rationale: fine-grained gathers on TPU cost ~a row per cycle, so
        ``positions[neighbor_indices]`` at [N, K] dominates the step profile.
        This path reorganizes the work so reindexing is cheap and AD-friendly:

        * atoms are scattered into cell slots once (N rows);
        * each cell's 27-neighborhood is fetched with coarse row gathers
          ([cells, 27] whole slot blocks);
        * pairwise distances come from a broadcast inside each cell block;
        * compaction to capacity K sorts only a ``stop_gradient`` key plus the
          candidate slot id — with no differentiable operands in the sort,
          jax.grad never has to transpose the O(rows x 27C) sorting network
          (which costs seconds);
        * the compacted payload (positions + features) is fetched with ONE
          packed [rows, K] gather whose VJP is a single scatter-add.

        Args:
          positions: [N, 3].
          box: [3, 3] reduced box.
          features: optional [N, F] per-atom features (e.g. the species
            one-hot) delivered per neighbor as part of the payload.

        Returns: NeighborPayload (original atom order). On capacity overflow
        (reported via max_neighbors / max_cell_occupancy) the result is
        incomplete — same soft-failure contract as getNeighborPairs.
        """
        if not self.use_cells:
            return self._payload_dense(positions, box, features)
        sel = self.select(positions, box)
        return self.payload_from_selection(positions, box, sel, features)

    def select(self, positions: Array, box: Array,
               build_mirror: bool = False) -> SlotSelection:
        """The non-differentiable selection phase: cell assignment, slot
        packing and per-atom compaction to K. Everything runs under
        stop_gradient — selection is a discrete choice; gradients flow only
        through the payload phase. Freeze once, reuse for many steps.

        ``build_mirror``: also pair every directed entry with its reverse
        copy (two single-key sorts, window._mirror_packed's relative-lane
        encoding) — required by the scatter-free distance-payload adjoint
        (:meth:`payload_distances_from_selection`).

        All per-candidate work runs over the N real atoms (sorted by cell),
        not over the cells*C slot grid — slot rows are ~2x padding at liquid
        density and would double every sort/gather/broadcast downstream.
        """
        positions = jax.lax.stop_gradient(positions)
        box = jax.lax.stop_gradient(box)
        n = positions.shape[0]
        nx, ny, nz = self.ncells
        ncells_arr = jnp.asarray([nx, ny, nz], jnp.int32)
        inv = jnp.linalg.inv(box)
        frac = box_transform(positions, inv)
        frac = frac - jnp.floor(frac)
        cell3 = jnp.clip((frac * ncells_arr).astype(jnp.int32), 0, ncells_arr - 1)
        cell_id = (cell3[:, 0] * ny + cell3[:, 1]) * nz + cell3[:, 2]

        order = jnp.argsort(cell_id, stable=True)
        sorted_ids = cell_id[order]
        # Rank within cell by scan (no binary search): segment starts are
        # boundaries in the sorted ids; rank = index - cummax(segment start).
        idx_n = jnp.arange(n, dtype=jnp.int32)
        new_seg = jnp.concatenate([jnp.ones((1,), bool),
                                   sorted_ids[1:] != sorted_ids[:-1]])
        seg_start = jax.lax.cummax(jnp.where(new_seg, idx_n, 0))
        rank_sorted = idx_n - seg_start
        occupancy = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), cell_id,
                                        num_segments=self.num_cells)
        max_occ = jnp.max(occupancy)

        c = self.cell_capacity
        cc = self.num_cells * c
        # Cell-overflow atoms scatter to cc+1 — out of bounds for every
        # (cc+1)-row slot array, so mode='drop' discards them and the zero
        # pad row at index cc stays zero. They keep their own (sorted-atom)
        # row below, so only their absence from OTHERS' candidate sets is
        # the overflow error (reported via max_cell_occupancy).
        slot_of_sorted = jnp.where(rank_sorted < c,
                                   sorted_ids * c + rank_sorted, cc + 1)
        pos_slots = jnp.zeros((cc, 3), positions.dtype)
        pos_sorted = positions[order]
        pos_slots = pos_slots.at[slot_of_sorted].set(pos_sorted, mode='drop')
        present = jnp.zeros((cc,), bool).at[slot_of_sorted].set(True, mode='drop')

        stencil = jnp.asarray(self._stencil())                 # [cells, 27]
        kk = 27 * c
        cand_slot = (stencil[:, :, None] * c
                     + jnp.arange(c, dtype=jnp.int32)).reshape(self.num_cells, kk)
        # Coarse block gathers: whole 27-neighborhoods per cell, then whole
        # candidate rows per atom. LAYOUT: the xyz axis is kept SECOND so the
        # large candidate axis is the 128-lane minor dim — a trailing dim of
        # 3 is padded 42x by TPU tiling (measured via an HBM OOM report).
        cand_pos_cells = pos_slots.reshape(self.num_cells, c, 3)[stencil]
        cand_pos_cells = cand_pos_cells.reshape(self.num_cells, 27 * c, 3)
        cand_pos_cells = cand_pos_cells.transpose(0, 2, 1)     # [cells, 3, kk]
        present_cells = present.reshape(self.num_cells, c)[stencil]
        present_cells = present_cells.reshape(self.num_cells, kk)

        cand_pos = cand_pos_cells[sorted_ids]                  # [N, 3, kk]
        cand_present = present_cells[sorted_ids]               # [N, kk]
        cand_slot_atom = cand_slot[sorted_ids]                 # [N, kk]

        delta = cand_pos - pos_sorted[:, :, None]              # [N, 3, kk]
        # Reduced-box minimum image, component form (c, then b, then a —
        # same order as geometry.minimum_image).
        dx, dy, dz = delta[:, 0, :], delta[:, 1, :], delta[:, 2, :]
        s3 = jnp.round(dz / box[2, 2])
        dx = dx - s3 * box[2, 0]
        dy = dy - s3 * box[2, 1]
        dz = dz - s3 * box[2, 2]
        s2 = jnp.round(dy / box[1, 1])
        dx = dx - s2 * box[1, 0]
        dy = dy - s2 * box[1, 1]
        dx = dx - jnp.round(dx / box[0, 0]) * box[0, 0]
        d2 = dx * dx + dy * dy + dz * dz                       # [N, kk]
        not_self = cand_slot_atom != slot_of_sorted[:, None]
        valid = cand_present & (d2 < self.cutoff * self.cutoff) & not_self
        counts = jnp.sum(valid.astype(jnp.int32), axis=1)

        # Compaction does not need distance order — any deterministic order
        # of the valid entries works — so pack (validity | slot id) into ONE
        # int32 sort key: valid candidates sort first (by slot id), invalid
        # ones are offset beyond every valid value.
        packed = jnp.where(valid, cand_slot_atom, cand_slot_atom + (cc + 1))
        packed = jax.lax.sort(packed, dimension=1)
        k = self.capacity
        packed_k = packed[:, :k]
        mask = packed_k <= cc
        nbr_slot_k = jnp.where(mask, packed_k, cc)             # [N, K]

        inv_order = jnp.zeros((n,), jnp.int32).at[order].set(
            idx_n, mode='drop')
        slot_to_atom = jnp.full((cc + 1,), n, jnp.int32)
        slot_to_atom = slot_to_atom.at[slot_of_sorted].set(
            order.astype(jnp.int32), mode='drop')
        mirror = None
        if build_mirror:
            from .window import _mirror_packed
            mirror = _mirror_packed(
                [(slot_of_sorted.astype(jnp.int32), nbr_slot_k, mask)],
                cc, grid3=self.ncells, c_per_cell=c)[0]
        return SlotSelection(order=order.astype(jnp.int32),
                             slot_of_sorted=slot_of_sorted.astype(jnp.int32),
                             inv_order=inv_order, slot_to_atom=slot_to_atom,
                             nbr_slot_k=nbr_slot_k, mask=mask,
                             max_neighbors=jnp.max(counts),
                             max_cell_occupancy=max_occ, mirror=mirror)

    def payload_from_selection(self, positions: Array, box: Array,
                               sel: SlotSelection,
                               features: Optional[Array] = None,
                               ) -> 'NeighborPayload':
        """The differentiable payload phase: re-scatter current positions
        (+features) into the frozen slots, fetch each atom's compacted
        neighbors with one packed gather, recompute deltas/distances. This is
        the only part that runs every MD step under slot-sticky (Verlet-skin)
        stepping. All rows are sorted-atom rows (N, not cells*C)."""
        n = positions.shape[0]
        num_feat = 0 if features is None else features.shape[1]
        c = self.cell_capacity
        cc = self.num_cells * c
        k = self.capacity

        pos_sorted = positions[sel.order]
        parts = [pos_sorted]
        if features is not None:
            parts.append(features[sel.order])
        packed = jnp.concatenate(parts, axis=1)                # [N, W]
        width = packed.shape[1]
        slots = jnp.zeros((cc + 1, width), positions.dtype)
        slots = slots.at[sel.slot_of_sorted].set(packed, mode='drop')

        nbr_payload = slots[sel.nbr_slot_k.reshape(-1)].reshape(n, k, width)
        deltas = minimum_image(nbr_payload[..., :3] - pos_sorted[:, None, :],
                               box)
        deltas = jnp.where(sel.mask[..., None], deltas, 0.0)
        dist = jnp.sqrt(jnp.where(sel.mask,
                                  jnp.sum(deltas * deltas, axis=-1), 1.0))
        dist = jnp.where(sel.mask, dist, 0.0)
        feats = (nbr_payload[..., 3:3 + num_feat]
                 if features is not None else None)
        nbr_idx = jnp.where(sel.mask, sel.slot_to_atom[sel.nbr_slot_k], n)

        # Back to original atom order: coarse row gathers of K-wide rows.
        io = sel.inv_order
        return NeighborPayload(
            deltas=deltas[io],
            distances=dist[io],
            features=(feats[io] if features is not None else None),
            indices=nbr_idx[io],
            mask=sel.mask[io],
            max_neighbors=sel.max_neighbors,
            max_cell_occupancy=sel.max_cell_occupancy)

    def payload_distances_from_selection(self, positions: Array, box: Array,
                                         sel: SlotSelection):
        """Distances-only payload phase with a SCATTER-FREE position
        adjoint (requires ``sel.mirror``; ``select(build_mirror=True)``).

        Returns ``(distances [N, K], indices [N, K], mask [N, K])`` in
        ORIGINAL atom order. For consumers that differentiate only through
        the DISTANCES (CFConv: the filter depends on r alone), the whole
        position adjoint collapses to dense math plus ONE single-key sort:

            d_pos_i = -sum_l (D[i,l] + D_mirror[i,l]) * u[i,l]

        where D is the incoming distance cotangent and u the unit delta.
        Proof: each directed entry (i -> j) contributes D[i,l] * (-u) to
        pos_i and D[i,l] * (+u) to pos_j; the pos_j halves, re-indexed by
        rows via the mirror pairing, are exactly D_mirror[i,l] * (-u[i,l])
        because the mirrored entry's unit vector is -u. The mirror apply is
        a permutation — one 2-array ``lax.sort`` by the involution-closed
        key (window._make_tier_geometry 'sort', same trick) — replacing
        XLA's 14M-row scatter-add transpose of the neighbor-slot gather
        (measured 280 ms of the 26k CFConv step, NOTES_PERF r5)."""
        if sel.mirror is None:
            raise ValueError('payload_distances_from_selection needs a '
                             'selection built with select(build_mirror='
                             'True)')
        n = positions.shape[0]
        c = self.cell_capacity
        cc = self.num_cells * c
        k = self.capacity
        dist_sorted = _dist_payload_sorted(
            positions, box, sel.order, sel.slot_of_sorted, sel.nbr_slot_k,
            sel.mask, sel.mirror, sel.inv_order, cc)
        from .window import _perm_gather
        dist = _perm_gather(dist_sorted, sel.inv_order, sel.order)
        nbr_idx = jnp.where(sel.mask, sel.slot_to_atom[sel.nbr_slot_k], n)
        return dist, nbr_idx[sel.inv_order], sel.mask[sel.inv_order]

    def _payload_dense(self, positions: Array, box: Optional[Array],
                       features: Optional[Array]) -> 'NeighborPayload':
        """Degenerate single-cell path: dense pairs, same payload contract."""
        n = positions.shape[0]
        delta = positions[None, :, :] - positions[:, None, :]
        delta = minimum_image(delta, box)
        d2 = jnp.sum(delta * delta, axis=-1)
        eye = jnp.eye(n, dtype=bool)
        valid = (d2 < self.cutoff * self.cutoff) & jnp.logical_not(eye)
        counts = jnp.sum(valid.astype(jnp.int32), axis=1)
        k = min(self.capacity, n)
        key = jnp.where(valid, jax.lax.stop_gradient(d2), jnp.inf)
        idx_f = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                                 (n, n)).astype(jnp.float32)
        key_s, nbr_f = jax.lax.sort([key, idx_f], dimension=1, num_keys=1)
        mask = jnp.isfinite(key_s[:, :k])
        nbr = jnp.where(mask, nbr_f[:, :k].astype(jnp.int32), n)
        pos_pad = jnp.concatenate([positions, jnp.zeros((1, 3), positions.dtype)])
        gathered = pos_pad[nbr]
        deltas = minimum_image(gathered - positions[:, None, :], box)
        deltas = jnp.where(mask[..., None], deltas, 0.0)
        dist = jnp.sqrt(jnp.where(mask, jnp.sum(deltas * deltas, -1), 1.0))
        dist = jnp.where(mask, dist, 0.0)
        feats = None
        if features is not None:
            f_pad = jnp.concatenate([features,
                                     jnp.zeros((1, features.shape[1]),
                                               features.dtype)])
            feats = jnp.where(mask[..., None], f_pad[nbr], 0.0)
        return NeighborPayload(
            deltas=deltas, distances=dist, features=feats, indices=nbr,
            mask=mask, max_neighbors=jnp.max(counts),
            max_cell_occupancy=jnp.asarray(n, jnp.int32))

    def _build_dense(self, positions: Array, box: Optional[Array]) -> NeighborList:
        """Degenerate path: brute-force candidates, same output contract."""
        n = positions.shape[0]
        delta = positions[None, :, :] - positions[:, None, :]
        delta = minimum_image(delta, box)
        d2 = jnp.sum(delta * delta, axis=-1)
        eye = jnp.eye(n, dtype=bool)
        valid = (d2 < self.cutoff * self.cutoff) & jnp.logical_not(eye)
        counts = jnp.sum(valid.astype(jnp.int32), axis=1)
        k = min(self.capacity, n)
        take, kept_valid = compact_rows(valid, k)
        kept = jnp.where(kept_valid, take, n)
        return NeighborList(kept.astype(jnp.int32), jnp.max(counts),
                            jnp.asarray(n, jnp.int32))


def payload_to_half_pairs(payload: NeighborPayload,
                          cutoff: Optional[float] = None) -> MaskedPairs:
    """Derive a masked half pair list (i < j) from a payload-carrying
    neighbor list — the O(N) replacement for the O(N^2) triangular
    enumeration in PME direct space (pme.py:163-165 builds its pair list from
    getNeighborPairs; here the cell list provides it). Deltas/distances are
    reused from the payload (no re-gather)."""
    n, k = payload.distances.shape
    atom1 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    mask = payload.mask & (payload.indices > atom1)
    if cutoff is not None:
        mask = mask & (payload.distances < cutoff)
    return MaskedPairs(
        atom1=jnp.where(mask, atom1, 0).reshape(-1),
        atom2=jnp.where(mask, payload.indices, 0).reshape(-1),
        # Payload deltas point atom -> neighbor; MaskedPairs' convention is
        # atom1 <- atom2 (pairs.py:146), hence the sign flip.
        deltas=jnp.where(mask[..., None], -payload.deltas, 0.0).reshape(-1, 3),
        distances=jnp.where(mask, payload.distances, 0.0).reshape(-1),
        mask=mask.reshape(-1),
        num_pairs=jnp.sum(mask.astype(jnp.int32)))


def neighbor_list_to_pairs(nlist: NeighborList, positions: Array,
                           box: Optional[Array] = None) -> MaskedPairs:
    """Derive a masked half pair list (i < j) from a directed neighbor list,
    for consumers like PME direct space that want per-pair iteration."""
    n, k = nlist.indices.shape
    atom1 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k)).reshape(-1)
    atom2 = nlist.indices.reshape(-1)
    mask = (atom2 < n) & (atom2 > atom1)
    safe2 = jnp.where(mask, atom2, 0)
    deltas = positions[atom1] - positions[safe2]
    if box is not None:
        deltas = minimum_image(deltas, box)
    d2 = jnp.sum(deltas * deltas, axis=-1)
    d2 = jnp.where(mask, d2, 1.0)
    distances = jnp.where(mask, jnp.sqrt(d2), 0.0)
    deltas = jnp.where(mask[:, None], deltas, 0.0)
    count = jnp.sum(mask.astype(jnp.int32))
    return MaskedPairs(jnp.where(mask, atom1, 0), safe2, deltas, distances,
                       mask, count)
