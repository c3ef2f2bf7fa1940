"""ctypes binding for the native host runtime (loader + capacity planner).

Builds ``libnnpops_host.so`` from ``loader.cpp`` on first use (g++, one
translation unit, ~1 s) and caches it next to the source. Every entry point
has a pure-Python fallback (``nnpops_tpu.utils.io``), so the package works
even without a compiler; the native path is for bulk ingestion and O(N)
capacity planning at production scale.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'loader.cpp')
_LIB = os.path.join(_DIR, 'libnnpops_host.so')
_lock = threading.Lock()
_lib = None


def _build() -> None:
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.nnpops_load.restype = ctypes.c_void_p
        lib.nnpops_load.argtypes = [ctypes.c_char_p]
        lib.nnpops_num_atoms.restype = ctypes.c_int32
        lib.nnpops_num_atoms.argtypes = [ctypes.c_void_p]
        lib.nnpops_has_box.restype = ctypes.c_int32
        lib.nnpops_has_box.argtypes = [ctypes.c_void_p]
        lib.nnpops_copy.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')]
        lib.nnpops_free.argtypes = [ctypes.c_void_p]
        lib.nnpops_plan_capacities.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS'),
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_float, ctypes.c_float,
            ctypes.c_float,
            np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')]
        _lib = lib
        return _lib


def load_molecule(path: str):
    """Load a mol2/PDB file natively; falls back to the Python parsers."""
    from ..utils.io import Molecule, load_mol2, load_pdb

    lib = get_lib()
    if lib is None:
        return load_mol2(path) if path.endswith('.mol2') else load_pdb(path)
    handle = lib.nnpops_load(path.encode())
    if not handle:
        raise ValueError(f'failed to parse {path}')
    try:
        n = lib.nnpops_num_atoms(handle)
        positions = np.empty((n, 3), np.float32)
        numbers = np.empty((n,), np.int32)
        box = np.zeros((3, 3), np.float32)
        lib.nnpops_copy(handle, positions, numbers, box)
        has_box = bool(lib.nnpops_has_box(handle))
    finally:
        lib.nnpops_free(handle)
    return Molecule(positions, numbers, box if has_box else None)


def plan_capacities(positions: np.ndarray, box: Optional[np.ndarray],
                    cutoff: float, angular_cutoff: float = 0.0,
                    cell_size: Optional[float] = None,
                    margin: float = 1.25) -> Tuple[int, int, int]:
    """Exact max neighbor counts (radial, angular) and cell occupancy for a
    configuration, scaled by a safety margin — use to size CellList/AEV
    static capacities so runtime overflow cannot happen.

    Falls back to a NumPy implementation without the native library.
    """
    positions = np.ascontiguousarray(positions, np.float32)
    n = len(positions)
    cs = float(cell_size if cell_size is not None else max(cutoff, 1e-3))
    lib = get_lib()
    if lib is not None:
        out = np.zeros(3, np.int32)
        box_arg = (np.ascontiguousarray(box, np.float32).ctypes.data_as(ctypes.c_void_p)
                   if box is not None else None)
        lib.nnpops_plan_capacities(positions, n, box_arg, float(cutoff),
                                   float(angular_cutoff), cs, out)
        k1, k2, occ = (int(x) for x in out)
    else:
        delta = positions[None] - positions[:, None]
        if box is not None:
            b = np.asarray(box, np.float64)
            delta = delta - np.round(delta[..., 2:3] / b[2, 2]) * b[2]
            delta = delta - np.round(delta[..., 1:2] / b[1, 1]) * b[1]
            delta = delta - np.round(delta[..., 0:1] / b[0, 0]) * b[0]
        d2 = (delta ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        k1 = int((d2 < cutoff * cutoff).sum(1).max())
        k2 = int((d2 < angular_cutoff * angular_cutoff).sum(1).max()) if angular_cutoff else 0
        # Real max cell occupancy by binning (matches the native planner).
        if box is not None:
            ext = np.diag(np.asarray(box, np.float64)).copy()
            origin = np.zeros(3)
        else:
            lo = positions.min(0).astype(np.float64)
            ext = positions.max(0) - lo + 1e-3
            origin = lo
        nc = np.maximum((ext / cs).astype(int), 1)
        f = (positions - origin) / ext
        f -= np.floor(f)
        cells3 = np.minimum((f * nc).astype(int), nc - 1)
        ids = (cells3[:, 0] * nc[1] + cells3[:, 1]) * nc[2] + cells3[:, 2]
        occ = int(np.bincount(ids).max())
    scale = lambda v: int(np.ceil(v * margin)) + 1
    return scale(k1), scale(k2), scale(occ)
