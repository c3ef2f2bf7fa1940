"""Ensemble-NN structure sweep at 26k atoms: batched dots vs block-diagonal
single wide matmuls (models concatenated on the feature axis).

The batched per-model dot_general measures ~1-3 TFLOP/s on this chip (vs
~200 peak bf16) — layer shapes [8, n, 160]x[8, 128, 160] are far off the
MXU sweet spot. The block-diagonal form pays 8x the (cheap) deep-layer
FLOPs to run every layer as ONE [n, m*i]x[m*i, m*o] matmul at full tile
sizes, and needs no model-major relayout after layer 0.
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
from nnpops_tpu.ops.batched_nn import _dot_bf16, celu, ensemble_energy
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


def bench_current(name, dtype):
    def f(a):
        g = jax.grad(lambda x: ensemble_energy(params.ensemble, x, grouping,
                                               dtype))(a)
        return a + 1e-3 * g
    timeit(name, f, aev)


bench_current('current bf16 fwd+bwd', jnp.bfloat16)


def block_diag(ws):
    """[m, o, i] -> [m*i, m*o] block-diagonal (transposed per model)."""
    m, o, i = ws.shape
    out = jnp.zeros((m * i, m * o), ws.dtype)
    for k in range(m):
        out = out.at[k * i:(k + 1) * i, k * o:(k + 1) * o].set(ws[k].T)
    return out


def apply_bd(net, x, bf16=True):
    m, o0, i0 = net.weights[0].shape
    w0 = net.weights[0].transpose(2, 0, 1).reshape(i0, m * o0)
    dot = _dot_bf16 if bf16 else (
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
    h = dot(x, w0) + net.biases[0].reshape(1, m * o0)
    if bf16:
        h = h.astype(jnp.bfloat16)
    h = celu(h)
    for layer in range(1, len(net.weights)):
        w, b = net.weights[layer], net.biases[layer]
        h = dot(h, block_diag(w)) + b.reshape(1, -1)
        if layer < len(net.weights) - 1:
            if bf16:
                h = h.astype(jnp.bfloat16)
            h = celu(h)
    return h.astype(jnp.float32)                          # [n, m]


def energy_bd(a, bf16=True):
    total = 0.0
    start = 0
    ga = a[jnp.asarray(grouping.order)]
    for s, count in enumerate(grouping.counts):
        if count == 0:
            continue
        block = jax.lax.slice_in_dim(ga, start, start + count, axis=0)
        e = apply_bd(params.ensemble.networks[s], block, bf16)
        total = total + jnp.sum(jnp.mean(e, axis=-1))
        start += count
    return total


def f_bd_bf16(a):
    g = jax.grad(lambda x: energy_bd(x, True))(a)
    return a + 1e-3 * g


def f_bd_f32(a):
    g = jax.grad(lambda x: energy_bd(x, False))(a)
    return a + 1e-3 * g


timeit('blockdiag bf16 fwd+bwd', f_bd_bf16, aev)
timeit('blockdiag f32 fwd+bwd', f_bd_f32, aev)

# Parity sanity
e1 = float(ensemble_energy(params.ensemble, aev, grouping))
e2 = float(energy_bd(aev, False))
print(f'parity: current {e1:.6f} blockdiag {e2:.6f} '
      f'rel {abs(e1 - e2) / abs(e1):.2e}', flush=True)
print('done', flush=True)
