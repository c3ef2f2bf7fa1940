"""Probe 3: tpu.dynamic_gather throughput with the SAME-SHAPE contract.

Mosaic lowers jnp.take_along_axis(x, ix, axis=0) to tpu.dynamic_gather when
ix.shape == x.shape. Measures that op at the shapes the fused AEV kernel
needs (window-local [768, 8] per cell; full-table [41472, 8]), loop-carried
so nothing hoists.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.RandomState(0)


def timeit(name, fn, table, *args, steps=20, calls=2):
    try:
        run = jax.jit(lambda t, *a: jax.lax.scan(
            lambda c, _: (fn(c, *a), None), t, None, length=steps)[0])
        out = run(table, *args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(calls):
            out = run(table, *args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (calls * steps) * 1e3
        print(f'{name}: {dt:.3f} ms/step', flush=True)
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:1])[:200]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)


# ---- A: window-local gather, grid over 1728 cells, [768, 8] per step.
CELLS, WIN, W = 1728, 768, 8

def kernel_a(win_ref, idx_ref, out_ref):
    ix = jnp.broadcast_to(idx_ref[:].reshape(WIN, 1), (WIN, W))
    out_ref[:] = jnp.take_along_axis(win_ref[:], ix, axis=0)


def fn_a(carry, idx):
    out = pl.pallas_call(
        kernel_a,
        out_shape=jax.ShapeDtypeStruct((CELLS * WIN, W), jnp.float32),
        grid=(CELLS,),
        in_specs=[
            pl.BlockSpec((WIN, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WIN,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((WIN, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(carry, idx)
    # fold output back into the carry so the scan can't hoist the kernel
    return carry + 1e-9 * out

win_tables = jnp.asarray(rng.rand(CELLS * WIN, W).astype(np.float32))
idx_a = jnp.asarray(rng.randint(0, WIN, (CELLS * WIN,)).astype(np.int32))
timeit(f'dynamic_gather window [768,8] x{CELLS} cells (1.3M rows)',
       fn_a, win_tables, idx_a)


# ---- B: full-table gather, 20 grid steps of [41472, 8].
CC, REPS = 41472, 20

def kernel_b(table_ref, idx_ref, out_ref):
    ix = jnp.broadcast_to(idx_ref[:].reshape(CC, 1), (CC, W))
    out_ref[:] = jnp.take_along_axis(table_ref[:], ix, axis=0)


def fn_b(carry, idx):
    out = pl.pallas_call(
        kernel_b,
        out_shape=jax.ShapeDtypeStruct((REPS * CC, W), jnp.float32),
        grid=(REPS,),
        in_specs=[
            pl.BlockSpec((CC, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CC,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CC, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(carry, idx)
    return carry + 1e-9 * out[:CC]

table_b = jnp.asarray(rng.rand(CC, W).astype(np.float32))
idx_b = jnp.asarray(rng.randint(0, CC, (REPS * CC,)).astype(np.int32))
timeit(f'dynamic_gather full [41472,8] x{REPS} (830k rows)',
       fn_b, table_b, idx_b)


# ---- C: XLA stencil-window materialization, loop-carried (honest).
C24 = 24
pos_slots = jnp.asarray(rng.rand(CELLS, C24 * W).astype(np.float32))
stencil = jnp.asarray(rng.randint(0, CELLS, (CELLS, 27)).astype(np.int32))


def fn_c(carry, stencil):
    win = carry[stencil.reshape(-1)]            # [cells*27, C*W] coarse rows
    return carry + 1e-9 * win.reshape(CELLS, 27, C24 * W).sum(axis=1)

timeit('XLA stencil window build [1728x27] coarse rows', fn_c, pos_slots,
       stencil)

# ---- D: XLA [N]-row scatter + gather roundtrip, loop-carried.
N = 26112
vals0 = jnp.asarray(rng.rand(N, W).astype(np.float32))
slot_of = jnp.asarray(rng.permutation(CC)[:N].astype(np.int32))


def fn_d(carry, slot_of):
    t = jnp.zeros((CC, W), jnp.float32).at[slot_of].set(carry)
    back = t[slot_of]
    return carry + 1e-9 * back

timeit('XLA scatter+gather roundtrip 26k rows (honest)', fn_d, vals0, slot_of)

# ---- E: XLA row gather 835k rows honest re-measure.
idx_e = jnp.asarray(rng.randint(0, CC, (N * 32,)).astype(np.int32))


def fn_e(carry, idx):
    out = carry[idx]                            # [835k, W]
    return carry + 1e-9 * out.reshape(N, 32, W).sum(axis=1).mean(axis=1, keepdims=True)

def fn_e2(carry, idx):
    out = carry[idx]
    folded = out.reshape(CC // 48 * 48 // 48, -1)[:CC].sum()
    return carry + 1e-12 * folded

timeit('XLA row gather 835k rows (honest)', lambda c, ix: c + 1e-9 * (
    c[ix].sum(axis=0, keepdims=True) * jnp.ones((CC, 1), jnp.float32)),
    table_b, idx_e)
print('done', flush=True)
