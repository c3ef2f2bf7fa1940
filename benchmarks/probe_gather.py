"""Probe: in-kernel VMEM gather rates on the real chip (v2 — no DCE).

Mosaic supports 2D gathers (take_along_axis style). Measures sublane-gather
from tables of several sizes, inside a Pallas kernel, with the output fully
consumed so nothing is DCE'd; XLA row-gather baselines alongside.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 26112           # atoms (padded)
KA = 32             # rows gathered per atom
B = 256             # atoms per kernel block
W = 8               # payload width

rng = np.random.RandomState(0)


def timeit(name, fn, *args, steps=20, calls=2):
    try:
        run = jax.jit(lambda c0, *a: jax.lax.scan(
            lambda c, _: (fn(c, *a), None), c0, None, length=steps)[0])
        out = run(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(calls):
            out = run(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (calls * steps) * 1e3
        print(f'{name}: {dt:.3f} ms/step', flush=True)
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:2])[:240]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)


def make_pallas_gather(cc):
    """Kernel: per block of B atoms, gather B*KA rows from a [cc, W] table
    resident in VMEM, via take_along_axis (2D sublane gather)."""
    def kernel(table_ref, idx_ref, out_ref):
        ix = idx_ref[:].reshape(B * KA, 1)           # [B*KA, 1]
        ixw = jnp.broadcast_to(ix, (B * KA, W))
        out_ref[:] = jnp.take_along_axis(table_ref[:], ixw, axis=0)

    def fn(carry, table, idx):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N * KA, W), jnp.float32),
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((cc, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, KA), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B * KA, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(table, idx)
        return carry + jnp.sum(out) * 1e-9
    return fn


for cc in (768, 4096, 41472):
    table = jnp.asarray(rng.rand(cc, W).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, cc, (N, KA)).astype(np.int32))
    timeit(f'pallas sublane-gather [{cc},{W}] x {N*KA//1000}k rows',
           make_pallas_gather(cc), jnp.zeros(()), table, idx)

# Lane-gather variant: table transposed [W, cc], gather along lanes.
def make_pallas_lane_gather(cc):
    def kernel(table_ref, idx_ref, out_ref):
        ix = idx_ref[:].reshape(1, B * KA)
        ixw = jnp.broadcast_to(ix, (W, B * KA))
        out_ref[:] = jnp.take_along_axis(table_ref[:], ixw, axis=1)

    def fn(carry, table_t, idx):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((W, N * KA), jnp.float32),
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((W, cc), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, KA), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((W, B * KA), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(table_t, idx)
        return carry + jnp.sum(out) * 1e-9
    return fn


for cc in (768, 4096, 41472):
    table_t = jnp.asarray(rng.rand(W, cc).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, cc, (N, KA)).astype(np.int32))
    timeit(f'pallas lane-gather [{W},{cc}] x {N*KA//1000}k',
           make_pallas_lane_gather(cc), jnp.zeros(()), table_t, idx)

# XLA baselines, fully consumed.
cc = 41472
table = jnp.asarray(rng.rand(cc, W).astype(np.float32))
idx = jnp.asarray(rng.randint(0, cc, (N, KA)).astype(np.int32))


def xla_gather(c, table, idx):
    out = table[idx.reshape(-1)]
    return c + jnp.sum(out) * 1e-9

timeit(f'XLA row gather [{cc},{W}] x {N*KA//1000}k rows', xla_gather,
       jnp.zeros(()), table, idx)

vals = jnp.asarray(rng.rand(N, W).astype(np.float32))
slot_of = jnp.asarray(rng.permutation(cc)[:N].astype(np.int32))


def xla_scatter(c, vals, slot_of):
    t = jnp.zeros((cc, W), jnp.float32).at[slot_of].set(vals + c)
    return c + jnp.sum(t) * 1e-9

timeit('XLA [26k]-row scatter into [41k,8]', xla_scatter, jnp.zeros(()),
       vals, slot_of)


def xla_reorder(c, vals, slot_of):
    t = jnp.zeros((cc, W), jnp.float32).at[slot_of].set(vals + c)
    back = t[slot_of]
    return c + jnp.sum(back) * 1e-9

timeit('XLA scatter+gather roundtrip [26k rows]', xla_reorder, jnp.zeros(()),
       vals, slot_of)

# The coarse stencil gather (window construction): [cells*27] block rows.
cells, C = 1728, 24
pos_slots = jnp.asarray(rng.rand(cells, C * W).astype(np.float32))
stencil = jnp.asarray(rng.randint(0, cells, (cells, 27)).astype(np.int32))


def xla_stencil(c, pos_slots, stencil):
    win = pos_slots[stencil.reshape(-1)]        # [cells*27, C*W]
    return c + jnp.sum(win) * 1e-9

timeit('XLA stencil gather [1728x27] blocks of 192', xla_stencil,
       jnp.zeros(()), pos_slots, stencil)
print('done', flush=True)
