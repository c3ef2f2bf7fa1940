"""Isolate the ensemble-NN cost at 26k atoms: f32 vs bf16 variants.

The round-2 notes recorded bf16 fwd+bwd at ~6.7 ms; a later runtime
upgrade measured 24 ms (slower than f32!). This probe bisects which piece
regressed: the custom-VJP bf16 cotangent matmuls, the bf16 activations, or
the batched dot_general layouts.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print('devices:', jax.devices(), flush=True)


def timeit(name, fn, *args, steps=10, calls=2):
    try:
        run = jax.jit(lambda *a: jax.lax.scan(
            lambda c, _: (fn(*((c,) + a[1:])), None), a[0], None,
            length=steps)[0])
        out = run(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(calls):
            out = run(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (calls * steps) * 1e3
        print(f'{name}: {dt:.3f} ms/step', flush=True)
        return dt
    except Exception as e:
        msg = ' '.join(str(e).split(chr(10))[:2])[:300]
        print(f'{name}: FAILED {type(e).__name__}: {msg}', flush=True)
        return None


from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.ops.batched_nn import (_batched_dot_bf16, _dot_bf16, celu,
                                       ensemble_energy)
from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
water = make_water_box(NMOL, seed=0)
basis = ANIBasis.ani2x()
model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
params = init_ani_params(jax.random.PRNGKey(0), basis)
grouping = model.grouping
n = len(water.atomic_numbers)
aev = jax.random.normal(jax.random.PRNGKey(1), (n, basis.aev_length),
                        jnp.float32) * 0.1


def bench_mode(name, compute_dtype):
    def f(a):
        g = jax.grad(lambda x: ensemble_energy(params.ensemble, x, grouping,
                                               compute_dtype))(a)
        return a + 1e-3 * g
    timeit(name, f, aev)


bench_mode('NN f32 fwd+bwd', None)
bench_mode('NN bf16 fwd+bwd (current)', jnp.bfloat16)


# Plain-cast bf16 (no custom VJP): forward ops in bf16, jax-derived bwd.
def apply_plain_bf16(net, x):
    m, out0, in0 = net.weights[0].shape
    w0 = net.weights[0].transpose(2, 0, 1).reshape(in0, m * out0)
    h = jnp.dot(x.astype(jnp.bfloat16), w0.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    h = jnp.moveaxis(h.reshape(x.shape[0], m, out0), 0, 1)
    h = celu(h + net.biases[0][:, None, :])
    for layer in range(1, len(net.weights)):
        w, b = net.weights[layer], net.biases[layer]
        h = jax.lax.dot_general(h.astype(jnp.bfloat16),
                                w.astype(jnp.bfloat16),
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        h = h + b[:, None, :]
        if layer < len(net.weights) - 1:
            h = celu(h)
    return h[:, :, 0].T


def energy_plain(a):
    total = 0.0
    start = 0
    ga = a[jnp.asarray(grouping.order)]
    for s, count in enumerate(grouping.counts):
        if count == 0:
            continue
        block = jax.lax.slice_in_dim(ga, start, start + count, axis=0)
        total = total + jnp.sum(jnp.mean(
            apply_plain_bf16(params.ensemble.networks[s], block), axis=-1))
        start += count
    return total


def f_plain(a):
    g = jax.grad(energy_plain)(a)
    return a + 1e-3 * g


timeit('NN bf16 plain-cast fwd+bwd', f_plain, aev)


# Microbench: the custom bf16 dots alone, layer-1 shape.
h1 = jax.random.normal(jax.random.PRNGKey(2), (8, 17340, 160),
                       jnp.float32) * 0.1
w1 = jax.random.normal(jax.random.PRNGKey(3), (8, 128, 160),
                       jnp.float32) * 0.1


def dot_custom(h):
    g = jax.grad(lambda x: jnp.sum(_batched_dot_bf16(x, w1) ** 2))(h)
    return h + 1e-3 * g


def dot_plain(h):
    def f(x):
        y = jax.lax.dot_general(x.astype(jnp.bfloat16),
                                w1.astype(jnp.bfloat16),
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        return jnp.sum(y ** 2)
    g = jax.grad(f)(h)
    return h + 1e-3 * g


def dot_f32(h):
    def f(x):
        y = jax.lax.dot_general(x, w1, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        return jnp.sum(y ** 2)
    g = jax.grad(f)(h)
    return h + 1e-3 * g


timeit('batched dot bf16 custom-vjp', dot_custom, h1)
timeit('batched dot bf16 plain', dot_plain, h1)
timeit('batched dot f32', dot_f32, h1)
print('done', flush=True)
