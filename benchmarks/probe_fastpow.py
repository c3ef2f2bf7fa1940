"""Validate a bitcast-based exp2/log2 fractional pow inside a Pallas TPU
kernel and fit/verify its polynomial coefficients.

base**zf for base in [1e-20, 2.05], zf ~ 0.1: the integer part of the
zeta exponent stays on the exact binary-exponentiation path, so the
fractional factor tolerates a short log2 polynomial (error amplification
is bounded by zf).
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')

# ---- fit near-minimax polys (Chebyshev-node least squares, f64) ----
def fit(fn, lo, hi, deg, constrain_ends=None):
    k = np.arange(4000)
    x = lo + (hi - lo) * 0.5 * (1 - np.cos(np.pi * (k + .5) / len(k)))
    y = fn(x)
    V = np.vander(x, deg + 1, increasing=True)
    c, *_ = np.linalg.lstsq(V, y, rcond=None)
    err = np.abs(V @ c - y).max()
    return c, err


# log2(1+t), t in [0,1): factor t out so log2(1)=0 exactly.
c_log, e_log = fit(lambda t: np.log2(1 + t) / np.where(t == 0, 1, t),
                   1e-12, 1.0, 5)
# 2^f, f in [0,1)
c_exp, e_exp = fit(lambda f: np.exp2(f), 0.0, 1.0, 5)
print('log2 poly resid', e_log, 'exp2 poly resid', e_exp)
print('c_log', list(c_log))
print('c_exp', list(c_exp))


def fast_frac_pow(base, zf):
    xi = jax.lax.bitcast_convert_type(base, jnp.int32)
    e = ((xi >> 23) & 0xFF).astype(jnp.float32) - 127.0
    m = jax.lax.bitcast_convert_type(
        (xi & 0x007FFFFF) | 0x3F800000, jnp.float32)
    t = m - 1.0
    p = c_log[5]
    for cc in c_log[4::-1]:
        p = p * t + cc
    y = zf * (e + t * p)
    k = jnp.floor(y)
    f = y - k
    q = c_exp[5]
    for cc in c_exp[4::-1]:
        q = q * f + cc
    scale = jax.lax.bitcast_convert_type(
        (k.astype(jnp.int32) + 127) << 23, jnp.float32)
    return q * scale


# ---- accuracy sweep (host, via jit on default backend) ----
b = jnp.asarray(np.concatenate([
    np.logspace(-20, 0.3, 20000), np.linspace(1e-6, 2.05, 20000)]),
    jnp.float32)
got = jax.jit(lambda x: fast_frac_pow(x, 0.1))(b)
ref = np.asarray(b, np.float64) ** 0.1
rel = np.abs(np.asarray(got, np.float64) - ref) / ref
print(f'host rel err: max {rel.max():.3e} mean {rel.mean():.3e}')

# full pow: base**14.1 split = int-part exact * frac fast
def pow_fast(base, z):
    zi = int(math.floor(z))
    r, sq, k = None, base, zi
    while k:
        if k & 1:
            r = sq if r is None else r * sq
        k >>= 1
        if k:
            sq = sq * sq
    return r * fast_frac_pow(base, z - zi)


got2 = jax.jit(lambda x: pow_fast(x, 14.1))(b)
ref2 = np.asarray(b, np.float64) ** 14.1
rel2 = np.abs(np.asarray(got2, np.float64) - ref2) / np.maximum(ref2, 1e-300)
print(f'full pow rel err: max {rel2.max():.3e} mean {rel2.mean():.3e}')

# ---- pallas kernel check on the real chip ----
def kern(x_ref, o_ref):
    o_ref[:] = pow_fast(x_ref[:], 14.1)


x = jnp.asarray(np.linspace(1e-4, 2.05, 8 * 128, dtype=np.float32)
                .reshape(8, 128))
try:
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32))(x)
    refk = np.asarray(x, np.float64) ** 14.1
    relk = np.abs(np.asarray(out, np.float64) - refk) / np.maximum(refk,
                                                                   1e-300)
    print(f'pallas on {jax.default_backend()}: max rel {relk.max():.3e}')
except Exception as ex:
    print('pallas FAILED:', type(ex).__name__, str(ex)[:500])

# ---- speed A/B at kernel-ish shapes: 8 pows per element ----
from tpu_timing import slope_ms  # noqa: E402

X = jnp.asarray(np.random.RandomState(0).uniform(
    1e-3, 2.0, (4096, 1024)).astype(np.float32))


def pow_ref(base, z):
    zi = int(math.floor(z))
    r, sq, k = None, base, zi
    while k:
        if k & 1:
            r = sq if r is None else r * sq
        k >>= 1
        if k:
            sq = sq * sq
    return r * jnp.exp((z - zi) * jnp.log(base))


def blk_ref(x):
    acc = jnp.zeros_like(x)
    for i in range(4):
        acc = acc + pow_ref(x + 0.01 * i, 14.1)
    return acc


def blk_fast(x):
    acc = jnp.zeros_like(x)
    for i in range(4):
        acc = acc + pow_fast(x + 0.01 * i, 14.1)
    return acc


def pk(f):
    def kern(x_ref, o_ref):
        o_ref[:] = f(x_ref[:])
    def run(x):
        grid = x.shape[0] // 512
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec((512, x.shape[1]), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((512, x.shape[1]), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32))(x)
    return run


print('ref 4xpow:', f'{slope_ms(pk(blk_ref), (X,)):.3f} ms')
print('fast 4xpow:', f'{slope_ms(pk(blk_fast), (X,)):.3f} ms')
