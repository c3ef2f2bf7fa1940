"""Can Mosaic gather from a VMEM-resident table, and at what rate?

The tier gather (neighbor positions for the angular kernel) runs as an XLA
HBM gather at ~4.5 ns/row — the measured row-latency wall. The slot table
at 26k is ~4 MB, so a Pallas kernel could hold it in VMEM and gather there.
This probe tests which gather forms Mosaic accepts and times them:
  A. jnp.take(table, idx, axis=0)  — row gather from a [L, 128] VMEM block
  B. jnp.take_along_axis(row, idx, axis=-1) — lane gather within rows
  C. one-hot matmul gather (MXU) on small windows
against the XLA HBM gather baseline on the same shapes.
"""
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_timing import slope_ms

L = 8192          # table rows (VMEM-resident)
M = 719872        # gather rows (~ the 26k tier-gather row count)
BM = 4096         # per-grid-step output rows
W = 128           # row width

rng = np.random.RandomState(0)
table = jnp.asarray(rng.rand(L, W), jnp.float32)
idx = jnp.asarray(rng.randint(0, L, size=(M,)), jnp.int32)


def t(name, fn, *args):
    try:
        def wrapped(c, *rest):
            out = fn(c, *rest)
            return jnp.stack([jnp.sum(x.astype(jnp.float32)) * 1e-9
                              for x in jax.tree.leaves(out)]
                             ).sum().reshape(1)
        ms = slope_ms(wrapped, args)
        print(f'{name}: {ms:.3f} ms  ({ms * 1e6 / M:.2f} ns/row)',
              flush=True)
        return ms
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:3])[:300]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)
        return None


def dep(x, c):
    z = c.reshape(-1)[0]
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x + (z > 1e30).astype(x.dtype)
    return x + z * 1e-30


# ---- baseline: XLA HBM gather
t('XLA gather [M] rows from [L,128]', lambda c: dep(table, c)[idx], table)


# ---- A: row gather inside a kernel, whole table as one VMEM block
def kern_take(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0,
                          unique_indices=False, indices_are_sorted=False)


def run_take(tab, ix):
    grid = M // BM
    return pl.pallas_call(
        kern_take,
        grid=(grid,),
        in_specs=[pl.BlockSpec((L, W), lambda i: (0, 0)),
                  pl.BlockSpec((BM,), lambda i: (i,))],
        out_specs=pl.BlockSpec((BM, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
    )(tab, ix)

t('pallas jnp.take axis=0 [8192,128] table', lambda c: run_take(
    dep(table, c), idx), table)


# ---- A2: same but table transposed, gather along lanes
tableT = table.T                     # [W, L]
def kern_take_lane(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=1)


def run_take_lane(tab, ix):
    grid = M // BM
    return pl.pallas_call(
        kern_take_lane,
        grid=(grid,),
        in_specs=[pl.BlockSpec((W, L), lambda i: (0, 0)),
                  pl.BlockSpec((BM,), lambda i: (i,))],
        out_specs=pl.BlockSpec((W, BM), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((W, M), jnp.float32),
    )(tab, ix)

t('pallas jnp.take axis=1 (lane gather)', lambda c: run_take_lane(
    dep(tableT, c), idx), tableT)


# ---- B: take_along_axis within small windows (the per-cell use case):
# each of 8 sublanes gathers its own lanes from a [8, 640] window.
idx2 = jnp.asarray(rng.randint(0, 640, size=(M // 64, 64)), jnp.int32)
win = jnp.asarray(rng.rand(M // 64, 640), jnp.float32)
BR = 2048

def kern_tala(win_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(win_ref[:], idx_ref[:], axis=1)


def run_tala(w, ix):
    grid = (M // 64) // BR
    return pl.pallas_call(
        kern_tala,
        grid=(grid,),
        in_specs=[pl.BlockSpec((BR, 640), lambda i: (i, 0)),
                  pl.BlockSpec((BR, 64), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BR, 64), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M // 64, 64), jnp.float32),
    )(w, ix)

t('pallas take_along_axis axis=1 [row,640]->[row,64]', lambda c: run_tala(
    dep(win, c), idx2), win)

# ---- baseline for B on XLA
t('XLA take_along_axis [row,640]->[row,64]', lambda c: jnp.take_along_axis(
    dep(win, c), idx2, axis=1), win)
