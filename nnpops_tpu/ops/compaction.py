"""Gather-based row compaction for static-capacity lists.

The obvious way to compact "the valid entries of each row, in order, padded to
capacity" is a stable sort on the validity mask — but TPU sorts are bitonic
networks, O(K log^2 K) passes over the whole array, and they dominated the
neighbor-build profile. This helper does it with a per-row prefix sum plus a
batched binary search (``searchsorted``): the position of the j-th valid
entry is the first index whose running count reaches j+1. Cost: one cumsum
over [N, K] and capacity * log2(K) gathers — an order of magnitude cheaper
than the sort, with identical (stable, deterministic) results.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def compact_rows(valid: Array, capacity: int) -> Tuple[Array, Array]:
    """Per row, indices of the first ``capacity`` True entries, in order.

    Args:
      valid: [N, K] bool.
      capacity: static slot count.

    Returns:
      (indices [N, capacity] int32 — positions into the K axis, clamped for
      padded slots; kept [N, capacity] bool — which slots hold a real entry).
    """
    counts = jnp.cumsum(valid.astype(jnp.int32), axis=1)     # [N, K]
    targets = jnp.arange(1, capacity + 1, dtype=jnp.int32)   # [cap]
    idx = jax.vmap(lambda row: jnp.searchsorted(row, targets, side='left'))(counts)
    kept = targets[None, :] <= counts[:, -1:]
    idx = jnp.minimum(idx, valid.shape[1] - 1).astype(jnp.int32)
    return idx, kept
