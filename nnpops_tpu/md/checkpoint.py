"""Checkpoint / resume for arbitrary pytrees (params and MD state).

The reference's only persistence is TorchScript ``def_pickle`` on its custom
classes (SymmetryFunctions.cpp:177-218), round-trip tested in §4.2. Here
everything is a pytree, so one npz-based save/restore covers model parameters
and simulation state alike; structure is validated against a template on load
(restore is exact — bitwise identical arrays).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, pytree: Any) -> None:
    """Save any pytree of arrays to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(pytree)
    arrays = {f'leaf_{i:05d}': np.asarray(leaf) for i, leaf in enumerate(leaves)}
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)   # atomic: a crash never leaves a torn checkpoint


def save_checkpoint_orbax(path: str, pytree: Any) -> None:
    """Orbax-backed checkpointing for multi-host / large-state runs (sharded
    arrays are saved in their native layout). Optional dependency — the npz
    path above covers single-host use without it."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), pytree, force=True)


def load_checkpoint_orbax(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def load_checkpoint(path: str, template: Any) -> Any:
    """Load a checkpoint saved by :func:`save_checkpoint` into the structure
    of ``template`` (shapes and dtypes must match)."""
    with np.load(path) as data:
        leaves = [data[f'leaf_{i:05d}'] for i in range(len(data.files))]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(f'checkpoint has {len(leaves)} leaves, '
                         f'template has {len(t_leaves)}')
    out = []
    for got, want in zip(leaves, t_leaves):
        want = np.asarray(want)
        if got.shape != want.shape:
            raise ValueError(f'leaf shape mismatch: {got.shape} vs {want.shape}')
        out.append(jax.numpy.asarray(got.astype(want.dtype)))
    return jax.tree_util.tree_unflatten(treedef, out)
