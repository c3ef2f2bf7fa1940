"""Isolate the cluster-radial kernel cost at 26k shapes (synthetic data).

Variants: base kernel (no gather/glue), aligned species-slice bounds,
single whole-row reduction, bigger ib blocks, ladder vs plain exp.
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnpops_tpu.ops.pallas_window import make_radial_ladder

print('devices:', jax.devices(), flush=True)

RC = 5.1
ETAS = (19.7,) * 16
RS = tuple(0.8 + 0.26875 * q for q in range(16))
CL = 8
N_R = 16


def make_kernel(lane_caps, ib, variant):
    lanes = sum(lane_caps) * CL
    npres = len(lane_caps)
    out_w = npres * N_R
    offs = np.cumsum((0,) + tuple(c * CL for c in lane_caps))
    sp_bounds = [(int(offs[j]), int(offs[j + 1])) for j in range(npres)]
    if variant == 'whole':
        sp_bounds = [(0, lanes)]
        out_w = N_R
    ladder = make_radial_ladder(RC, ETAS, RS)

    def iter_exps(r):
        if variant == 'noladder':
            for q in range(N_R):
                yield q, jnp.exp(-ETAS[q] * (r - RS[q]) ** 2)
        else:
            yield from ladder(r)

    def fwd_kernel(jx_ref, jy_ref, jz_ref, ctr_ref, out_ref):
        for i in range(ib):
            jx = jx_ref[i:i + 1]
            jy = jy_ref[i:i + 1]
            jz = jz_ref[i:i + 1]
            ctr = ctr_ref[i]
            dx = jx - ctr[:, 0:1]
            dy = jy - ctr[:, 1:2]
            dz = jz - ctr[:, 2:3]
            d2 = dx * dx + dy * dy + dz * dz
            lane = jax.lax.broadcasted_iota(jnp.int32, (CL, lanes), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (CL, lanes), 0)
            valid = (d2 < RC * RC) & (lane != row)
            r = jnp.sqrt(jnp.maximum(d2, 1e-12))
            fc = jnp.where(valid, 0.5 * jnp.cos(math.pi / RC * r) + 0.5,
                           0.0)
            cols = [None] * out_w
            for q, e in iter_exps(r):
                we = fc * e
                for s, (b0, b1) in enumerate(sp_bounds):
                    cols[s * N_R + q] = 0.25 * jnp.sum(
                        we[:, b0:b1], axis=1, keepdims=True)
            out_ref[i] = jnp.concatenate(cols, axis=1)
        return

    def lane_spec():
        return pl.BlockSpec((ib, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def run(jx, jy, jz, ctr):
        ncl = jx.shape[0]
        return pl.pallas_call(
            fwd_kernel, grid=(ncl // ib,),
            in_specs=[lane_spec()] * 3
            + [pl.BlockSpec((ib, CL, 3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ib, CL, out_w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ncl, CL, out_w), jnp.float32),
        )(jx, jy, jz, ctr)
    return run


def timeit(name, fn, *args, steps=10, calls=2):
    try:
        run = jax.jit(lambda *a: jax.lax.scan(
            lambda c, _: (c + 1e-9 * jnp.sum(fn(c + 1.0, *a[1:])), None),
            a[0], None, length=steps)[0])
        out = run(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(calls):
            out = run(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (calls * steps) * 1e3
        print(f'{name}: {dt:.3f} ms/step', flush=True)
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:3])[:300]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)


key = jax.random.PRNGKey(0)
# H-species shapes from the 26k plan: ncl 2200, caps (44, 36); plus O 1104
# (61, 35). Time the H call only; scale in analysis.
for tag, ncl, caps in (('H', 2208, (44, 36)), ('O', 1104, (61, 35))):
    lanes = sum(caps) * CL
    jx = jax.random.uniform(key, (ncl, lanes)) * 60
    jy = jax.random.uniform(key, (ncl, lanes)) * 60
    jz = jax.random.uniform(key, (ncl, lanes)) * 60
    ctr = jax.random.uniform(key, (ncl, CL, 3)) * 60
    for variant in ('base', 'whole', 'noladder'):
        for ib in (8, 32):
            if variant != 'base' and ib != 8:
                continue
            timeit(f'{tag} {variant} ib={ib}',
                   make_kernel(caps, ib, variant), jx, jy, jz, ctr)
# Aligned caps variant: species blocks at 128-lane multiples.
for tag, ncl, caps in (('H-al', 2208, (48, 32)), ('O-al', 1104, (64, 32)),):
    lanes = sum(caps) * CL
    jx = jax.random.uniform(key, (ncl, lanes)) * 60
    jy = jax.random.uniform(key, (ncl, lanes)) * 60
    jz = jax.random.uniform(key, (ncl, lanes)) * 60
    ctr = jax.random.uniform(key, (ncl, CL, 3)) * 60
    for ib in (8, 32):
        timeit(f'{tag} base ib={ib}', make_kernel(caps, ib, 'base'),
               jx, jy, jz, ctr)
print('done', flush=True)
