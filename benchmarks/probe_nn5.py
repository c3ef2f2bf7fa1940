"""Bisect the fused-NN kernel cost at 26k rows: matmul vs CELU vs layout.

Variants (all m=8 models, dims 1008-256-192-160-1, fwd only):
  full      — the production fwd kernel math (bf16 matmuls, CELU)
  relu      — CELU replaced by max(z, 0): isolates the exp cost
  nomm      — matmuls replaced by a broadcasted slice (keeps CELU): isolates
              the matmul cost
  wt        — weights pre-transposed to [in, out] so the fwd contraction is
              over dim 0 (natural MXU layout; tests whether Mosaic pays a
              per-step transpose for the [out, in] layout)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print('devices:', jax.devices(), flush=True)

DIMS = (1008, 256, 192, 160, 1)
M = 8
B = 256
N = 17408  # ~2/3 of 26k, H-net share, multiple of 256
f32 = jnp.float32
bf16 = jnp.bfloat16
ALPHA = 0.1

key = jax.random.PRNGKey(0)
ws = [jax.random.normal(jax.random.PRNGKey(l), (M, DIMS[l + 1], DIMS[l]),
                        f32) * 0.05 for l in range(4)]
bs = [jnp.zeros((M, 1, DIMS[l + 1]), f32) for l in range(4)]
x = jax.random.normal(key, (N, DIMS[0]), f32) * 0.3


def build(variant, B=B):
    wt = variant == 'wt'
    weights = [w.astype(bf16) for w in ws]
    if wt:
        weights = [jnp.transpose(w, (0, 2, 1)) for w in weights]

    def matmul(h, w):
        if variant == 'nomm':
            out_d = w.shape[1] if wt else w.shape[0]
            return jnp.broadcast_to(h[:, :1], (B, out_d)) * 0.01
        dims = (((1,), (0 if wt else 1,)), ((), ()))
        return jax.lax.dot_general(h.astype(bf16), w, dims,
                                   preferred_element_type=f32)

    def act(z):
        if variant == 'relu':
            return jnp.maximum(z, 0.0)
        return jnp.where(z > 0, z, ALPHA * (jnp.exp(z / ALPHA) - 1.0))

    def kernel(x_ref, *refs):
        w_refs = refs[:4]
        b_refs = refs[4:8]
        out_ref = refs[8]
        xx = x_ref[...]
        acc = jnp.zeros((B, DIMS[-2]), f32)
        for mi in range(M):
            h = xx
            for l in range(3):
                z = matmul(h, w_refs[l][mi]) + b_refs[l][mi]
                h = act(z)
            wl = w_refs[3][mi].astype(f32)
            acc = acc + h * (wl if wt else wl)
        out_ref[...] = jnp.sum(acc, axis=1, keepdims=True) * (1.0 / M)

    def row_spec(w):
        return pl.BlockSpec((B, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    wlast = weights[3]
    if wt:
        wlast = jnp.transpose(weights[3], (0, 2, 1))  # back to [m,1,d3]

    def run(x):
        wss = list(weights[:3]) + [wlast.reshape(M, 1, DIMS[-2])]
        return pl.pallas_call(
            kernel, grid=(N // B,),
            in_specs=[row_spec(DIMS[0])] + [const_spec(w.shape) for w in wss]
            + [const_spec(b.shape) for b in bs],
            out_specs=row_spec(1),
            out_shape=jax.ShapeDtypeStruct((N, 1), f32),
        )(x, *wss, *bs)
    return run


def timeit(name, fn, steps=10, calls=3):
    run = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (c + 1e-9 * jnp.sum(fn(c)), None), x, None,
        length=steps)[0])
    out = run(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = run(x)
    jax.block_until_ready(out)
    print(f'{name}: {(time.perf_counter() - t0) / (calls * steps) * 1e3:.3f}'
          ' ms/call', flush=True)


for v in ('full', 'relu', 'nomm', 'wt'):
    try:
        timeit(v, build(v))
    except Exception as e:
        print(f'{v}: FAILED {type(e).__name__}: {str(e)[:200]}', flush=True)
for bsz in (128, 512, 1024):
    try:
        timeit(f'full-b{bsz}', build('full', B=bsz))
    except Exception as e:
        print(f'full-b{bsz}: FAILED {type(e).__name__}: {str(e)[:160]}', flush=True)
print('done', flush=True)
