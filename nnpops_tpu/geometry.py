"""Periodic-box geometry utilities.

Implements the minimum-image displacement convention of the reference
(NNPOps ``src/ani/CpuANISymmetryFunctions.cpp:355-379`` and
``src/pytorch/neighbors/getNeighborPairsCPU.cpp:64-69``) for *reduced*
triclinic boxes: the box matrix is lower-triangular (rows a, b, c with
``a = [ax,0,0]``, ``b = [bx,by,0]``, ``c = [cx,cy,cz]``) and the cutoff is at
most half the smallest box width, so a single round-based wrap per axis is a
valid minimum-image.

Unlike the reference, which compiles separate rectangular and triclinic code
paths (templates on ``PERIODIC``/``TRICLINIC``), we use one branch-free path:
for a rectangular box the off-diagonal terms are zero and the general wrap
degenerates to the per-axis wrap, so XLA sees a single static program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def box_transform(vecs: Array, mat: Array) -> Array:
    """``vecs @ mat`` at full f32 accuracy (Precision.HIGHEST).

    On TPU the DEFAULT matmul precision is a single bf16 pass — box vectors
    round to 8 mantissa bits, i.e. ~0.25 A at a 64 A box. Every product of
    coordinates/wrap factors with box or reciprocal vectors must therefore
    pin the precision; a rounded wrap shift displaces boundary atoms by up
    to ~0.03 A and silently corrupts their forces (measured via the window
    shift planes, NOTES_PERF round-2).
    """
    return jax.lax.dot_general(
        vecs, mat, (((vecs.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def minimum_image(delta: Array, box: Array | None) -> Array:
    """Apply the minimum-image convention to displacement vectors.

    Mirrors the wrap order of the reference (c, then b, then a:
    CpuANISymmetryFunctions.cpp:361-371), which is only correct for reduced
    lower-triangular boxes — the same precondition the reference enforces
    (getNeighborPairsCPU.cpp:40-48).

    Args:
      delta: [..., 3] displacement vectors.
      box: [3, 3] box vectors as rows, or None for a non-periodic system.

    Returns:
      [..., 3] wrapped displacements.
    """
    if box is None:
        return delta
    delta = delta - jnp.round(delta[..., 2:3] / box[2, 2]) * box[2]
    delta = delta - jnp.round(delta[..., 1:2] / box[1, 1]) * box[1]
    delta = delta - jnp.round(delta[..., 0:1] / box[0, 0]) * box[0]
    return delta


def validate_box(box, cutoff: float) -> None:
    """Host-side validation of reduced-form box vectors.

    Same checks as the reference (getNeighborPairsCPU.cpp:40-48): the box must
    be in reduced lower-triangular form and every axis must be at least twice
    the cutoff, which is the precondition for single-image wrapping.
    Raises ValueError on violation. Call outside jit with concrete values.
    """
    v = np.asarray(box, dtype=np.float64)
    if v.shape != (3, 3):
        raise ValueError('box_vectors must have shape (3, 3)')
    c = float(cutoff)
    if v[0][1] != 0 or v[0][2] != 0 or v[1][2] != 0:
        raise ValueError('Invalid box vectors: not in reduced form '
                         '(a[1], a[2], b[2] must be zero)')
    if v[0][0] < 2 * c or v[1][1] < 2 * c or v[2][2] < 2 * c:
        raise ValueError('Invalid box vectors: every box width must be >= 2*cutoff')
    if v[0][0] < 2 * v[1][0] or v[0][0] < 2 * v[2][0] or v[1][1] < 2 * v[2][1]:
        raise ValueError('Invalid box vectors: not in reduced form '
                         '(a[0] >= 2*b[0], a[0] >= 2*c[0], b[1] >= 2*c[1] required)')


def invert_box(box: Array) -> Array:
    """Inverse of a reduced lower-triangular box matrix.

    Closed-form triangular inverse matching the reference's
    ``invertBoxVectors`` (pmeCPU.cpp:11-24). ``invert_box(box)[i][j]`` is the
    reciprocal vector component such that ``pos @ invert_box(box)`` yields
    fractional coordinates.
    """
    det = box[0, 0] * box[1, 1] * box[2, 2]
    scale = 1.0 / det
    zero = jnp.zeros((), dtype=box.dtype)
    r00 = box[1, 1] * box[2, 2] * scale
    r10 = -box[1, 0] * box[2, 2] * scale
    r11 = box[0, 0] * box[2, 2] * scale
    r20 = (box[1, 0] * box[2, 1] - box[1, 1] * box[2, 0]) * scale
    r21 = -box[0, 0] * box[2, 1] * scale
    r22 = box[0, 0] * box[1, 1] * scale
    return jnp.stack([
        jnp.stack([r00, zero, zero]),
        jnp.stack([r10, r11, zero]),
        jnp.stack([r20, r21, r22]),
    ])


def cosine_cutoff(r: Array, cutoff: float) -> Array:
    """The ANI/SchNet cosine cutoff ``0.5*cos(pi*r/rc) + 0.5``.

    (CpuANISymmetryFunctions.cpp:381-383, CpuCFConv.cpp:301-303.)
    Only valid for ``r <= cutoff``; callers mask contributions beyond it.
    """
    return 0.5 * jnp.cos(jnp.pi * r / cutoff) + 0.5


def safe_norm(vec: Array, axis: int = -1, eps: float = 0.0) -> Array:
    """Norm whose gradient is finite at zero (double-where trick)."""
    sq = jnp.sum(vec * vec, axis=axis)
    guarded = jnp.where(sq > eps, sq, 1.0)
    return jnp.where(sq > eps, jnp.sqrt(guarded), 0.0)
