"""Fixed-capacity neighbor-pair enumeration (the ``getNeighborPairs`` op).

API-compatible, static-shape reimplementation of the reference op declared at
``src/pytorch/neighbors/neighbors.cpp:3-5`` with the semantics documented in
``src/pytorch/neighbors/getNeighborPairs.py``:

* all-pairs mode (``max_num_pairs == -1``): every unordered pair is returned;
  pairs beyond the cutoff get index -1 and NaN deltas/distances.
* capacity mode (``max_num_pairs > 0``): pairs within the cutoff are compacted
  to the front, padded with -1/NaN; ``num_pairs`` reports the TRUE number
  found, which may exceed the capacity (the overflow contract of
  getNeighborPairs.py:77-83 — this is what keeps shapes static under jit).

Differences from the reference, by design:

* deterministic pair order even in capacity mode (the CUDA reference is
  explicitly non-deterministic, getNeighborPairs.py:95-96) — compaction uses a
  stable sort on the validity mask.
* everything is one jit-able XLA program; there is no device dispatch layer.
  The CUDA-graph compatibility contract (fixed shapes, no sync) holds by
  construction.

NaN padding exists only at this API boundary. Internal consumers (AEV, PME)
use masked finite values so that ``jax.grad`` stays NaN-free (see
``neighbor_pairs_masked``).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import minimum_image, validate_box

Array = jnp.ndarray


def _validate_box_if_concrete(box_vectors, cutoff: float) -> None:
    """Enforce the reduced-form / half-box preconditions of the reference
    (getNeighborPairsCPU.cpp:40-48) whenever the box is a concrete value.
    Inside jit the box is a tracer and the check is skipped — the caller is
    expected to have validated the geometry host-side (e.g. CellList.create,
    PME.compute_direct do)."""
    if box_vectors is None or isinstance(box_vectors, jax.core.Tracer):
        return
    if hasattr(box_vectors, 'size') and not box_vectors.size:
        return
    validate_box(box_vectors, cutoff)


def _triangular_pairs(num_atoms: int) -> Tuple[Array, Array]:
    """Closed-form (row, col) decode of the flat triangular pair index.

    Same decode as the reference (getNeighborPairsCPU.cpp:58-61): for flat
    index p of the strictly-lower-triangular enumeration, row r is the largest
    integer with r(r-1)/2 <= p, col = p - r(r-1)/2. Computed with float sqrt
    plus an exact integer correction so it is safe for large N.
    """
    num_pairs = num_atoms * (num_atoms - 1) // 2
    idx = jnp.arange(num_pairs, dtype=jnp.int32)
    rows = jnp.floor((jnp.sqrt(8.0 * idx.astype(jnp.float32) + 1.0) + 1.0) / 2.0).astype(jnp.int32)
    rows = rows - (rows * (rows - 1) > 2 * idx).astype(jnp.int32)
    # Guard against float rounding in the other direction as well.
    rows = rows + ((rows + 1) * rows <= 2 * idx).astype(jnp.int32)
    cols = idx - rows * (rows - 1) // 2
    return rows, cols


class NeighborPairs(NamedTuple):
    """Result of :func:`get_neighbor_pairs` (mirrors the reference op outputs)."""
    neighbors: Array   # int32 [2, P]; -1 marks padding
    deltas: Array      # float [P, 3]; NaN marks padding
    distances: Array   # float [P]; NaN marks padding
    num_pairs: Array   # int32 [1]; TRUE number of pairs found


def get_neighbor_pairs(
    positions: Array,
    cutoff: float,
    max_num_pairs: int = -1,
    box_vectors: Optional[Array] = None,
    check_errors: bool = False,
) -> NeighborPairs:
    """Return indices, deltas and distances of atom pairs within ``cutoff``.

    See module docstring for semantics. ``deltas[p] = positions[neighbors[0,p]]
    - positions[neighbors[1,p]]`` (direction from ``neighbors[1]`` to
    ``neighbors[0]``, getNeighborPairs.py:66-68), minimum-imaged when
    ``box_vectors`` is given.

    ``check_errors=True`` synchronizes on the pair count and raises
    RuntimeError on overflow; it must not be used inside jit (the same
    trade-off as the reference's CUDA-graph-incompatible check,
    getNeighborPairsCUDA.cu:156-160).
    """
    _validate_box_if_concrete(box_vectors, cutoff)
    result = _get_neighbor_pairs_impl(positions, float(cutoff), int(max_num_pairs),
                                      box_vectors)
    if check_errors and max_num_pairs > 0:
        found = int(result.num_pairs[0])
        if found > max_num_pairs:
            raise RuntimeError(
                'The maximum number of pairs has been exceeded! '
                f'Found {found} but max_num_pairs={max_num_pairs}')
    return result


def _get_neighbor_pairs_impl(positions, cutoff, max_num_pairs, box_vectors):
    num_atoms = positions.shape[0]
    rows, cols = _triangular_pairs(num_atoms)
    deltas = positions[rows] - positions[cols]
    if box_vectors is not None and box_vectors.size:
        deltas = minimum_image(deltas, box_vectors)
    distances = jnp.sqrt(jnp.sum(deltas * deltas, axis=-1))
    within = distances <= cutoff
    nan = jnp.float32(jnp.nan).astype(positions.dtype)

    if max_num_pairs == -1:
        neighbors = jnp.where(within[None, :], jnp.stack([rows, cols]), -1)
        deltas = jnp.where(within[:, None], deltas, nan)
        distances = jnp.where(within, distances, nan)
        count = jnp.full((1,), distances.shape[0], dtype=jnp.int32)
        return NeighborPairs(neighbors, deltas, distances, count)

    # Capacity mode: stable-compact valid pairs to the front, then truncate or
    # pad to the static capacity. Stable sort on the inverted mask preserves
    # the enumeration order of valid pairs (deterministic, unlike the CUDA
    # reference's atomicAdd append at getNeighborPairsCUDA.cu:68-70).
    order = jnp.argsort(jnp.logical_not(within), stable=True)
    num_found = jnp.sum(within.astype(jnp.int32))
    num_pairs = rows.shape[0]
    cap = max_num_pairs
    if cap >= num_pairs:
        take = order
        pad = cap - num_pairs
        take = jnp.concatenate([take, jnp.zeros((pad,), dtype=take.dtype)])
        slot_valid = jnp.arange(cap, dtype=jnp.int32) < num_found
    else:
        take = order[:cap]
        slot_valid = jnp.arange(cap, dtype=jnp.int32) < num_found
    neighbors = jnp.where(slot_valid[None, :],
                          jnp.stack([rows[take], cols[take]]), -1)
    deltas = jnp.where(slot_valid[:, None], deltas[take], nan)
    distances = jnp.where(slot_valid, distances[take], nan)
    return NeighborPairs(neighbors, deltas, distances,
                         num_found.reshape(1).astype(jnp.int32))


class MaskedPairs(NamedTuple):
    """Grad-safe padded pair list for internal consumers (AEV, PME direct).

    Padding carries index 0/0, zero deltas and distance 0 under a False mask
    instead of NaN, so masked contributions are exactly zero in both the
    primal and the cotangent (survey §7.3: NaN poisons jax.grad even through
    ``where``).
    """
    atom1: Array      # int32 [P]
    atom2: Array      # int32 [P]
    deltas: Array     # [P, 3] (atom1 <- atom2 direction, minimum-imaged)
    distances: Array  # [P]
    mask: Array       # bool [P]
    num_pairs: Array  # int32 [] true count


def neighbor_pairs_masked(
    positions: Array,
    cutoff: float,
    max_num_pairs: int = -1,
    box_vectors: Optional[Array] = None,
) -> MaskedPairs:
    """All-pairs (or capacity-compacted) masked pair list without NaNs."""
    _validate_box_if_concrete(box_vectors, cutoff)
    num_atoms = positions.shape[0]
    rows, cols = _triangular_pairs(num_atoms)
    deltas = positions[rows] - positions[cols]
    if box_vectors is not None and box_vectors.size:
        deltas = minimum_image(deltas, box_vectors)
    d2 = jnp.sum(deltas * deltas, axis=-1)
    within = d2 <= cutoff * cutoff
    num_found = jnp.sum(within.astype(jnp.int32))
    if max_num_pairs != -1 and max_num_pairs < rows.shape[0]:
        order = jnp.argsort(jnp.logical_not(within), stable=True)[:max_num_pairs]
        rows, cols, deltas, d2 = rows[order], cols[order], deltas[order], d2[order]
        within = jnp.arange(max_num_pairs, dtype=jnp.int32) < num_found
    safe_d2 = jnp.where(within, d2, 1.0)
    distances = jnp.where(within, jnp.sqrt(safe_d2), 0.0)
    rows = jnp.where(within, rows, 0)
    cols = jnp.where(within, cols, 0)
    deltas = jnp.where(within[:, None], deltas, 0.0)
    return MaskedPairs(rows, cols, deltas, distances, within, num_found)
