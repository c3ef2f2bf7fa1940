"""Probe 4: isolate tpu.dynamic_gather viability by shape.

All arrays 2D, outputs consumed through tanh (no linear-rewrite escape).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.RandomState(0)


def bench_scan(name, fn, carry0, *args, steps=20, calls=2):
    try:
        run = jax.jit(lambda c0, *a: jax.lax.scan(
            lambda c, _: (fn(c, *a), None), c0, None, length=steps)[0])
        out = run(carry0, *args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(calls):
            out = run(carry0, *args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (calls * steps) * 1e3
        print(f'{name}: {dt:.3f} ms/step', flush=True)
        return dt
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:1])[:160]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)
        return None


def try_gather_once(rows, lanes, axis=0):
    """Single pallas_call (no grid): gather same-shape, tanh-consumed."""
    name = f'single dynamic_gather [{rows},{lanes}] axis{axis}'
    try:
        x = jnp.asarray(rng.rand(rows, lanes).astype(np.float32))
        if axis == 0:
            ix = jnp.asarray(rng.randint(0, rows, (rows, lanes)).astype(np.int32))
        else:
            ix = jnp.asarray(rng.randint(0, lanes, (rows, lanes)).astype(np.int32))

        def kernel(x_ref, ix_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], ix_ref[:], axis=axis)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, ix)
        ok = np.allclose(np.asarray(out),
                         np.take_along_axis(np.asarray(x), np.asarray(ix),
                                            axis=axis))
        print(f'{name}: OK correct={ok}', flush=True)
        return True
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:1])[:160]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)
        return False


# Which shapes compile at all?
try_gather_once(8, 128, axis=0)
try_gather_once(64, 128, axis=0)
try_gather_once(768, 128, axis=0)
try_gather_once(768, 8, axis=0)
try_gather_once(8, 128, axis=1)
try_gather_once(8, 768, axis=1)
try_gather_once(32, 1024, axis=1)

# Throughput for whichever big shape worked (axis 0, [768, 128] expected).
CELLS = 1728
ROWS, LANES = 768, 128

def kernel_g(x_ref, ix_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], ix_ref[:], axis=0)


def fn_gather_grid(carry, ix):
    out = pl.pallas_call(
        kernel_g,
        out_shape=jax.ShapeDtypeStruct((CELLS * ROWS, LANES), jnp.float32),
        grid=(CELLS,),
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(carry, ix)
    return jnp.tanh(out) * 1e-3 + carry * (1.0 - 1e-3)

big = jnp.asarray(rng.rand(CELLS * ROWS, LANES).astype(np.float32))
ix_big = jnp.asarray(rng.randint(0, ROWS, (CELLS * ROWS, LANES)).astype(np.int32))
bench_scan(f'dynamic_gather grid [{ROWS},{LANES}] x{CELLS}', fn_gather_grid,
           big, ix_big)

# XLA honest gather baseline with tanh consumption (no linear rewrite).
CC, W, NK = 41472, 8, 26112 * 32
table0 = jnp.asarray(rng.rand(CC, W).astype(np.float32))
idx_flat = jnp.asarray(rng.randint(0, CC, (NK,)).astype(np.int32))


def fn_xla(carry, idx):
    out = jnp.tanh(carry[idx])
    upd = out.reshape(-1, 32, W).sum(axis=1)[:CC]
    return carry + 1e-9 * jnp.pad(upd, ((0, CC - upd.shape[0]), (0, 0)))

bench_scan('XLA row gather 835k rows (tanh-consumed)', fn_xla, table0,
           idx_flat)
print('done', flush=True)
