"""Prebuilt block-diagonal deep layers: is the batched-dot slowness the
matmul or the per-step block_diag construction?"""
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


def block_diag_np(ws):
    m, o, i = ws.shape
    out = np.zeros((m * i, m * o), np.float32)
    for k in range(m):
        out[k * i:(k + 1) * i, k * o:(k + 1) * o] = np.asarray(ws[k]).T
    return jnp.asarray(out)


# Prebuilt prepared params (host-side, once).
prepared = []
for net in params.ensemble.networks:
    m, o0, i0 = net.weights[0].shape
    w0 = jnp.asarray(np.asarray(net.weights[0]).transpose(2, 0, 1)
                     .reshape(i0, m * o0))
    b0 = jnp.asarray(np.asarray(net.biases[0]).reshape(1, m * o0))
    deeps = []
    for layer in range(1, len(net.weights)):
        deeps.append((block_diag_np(net.weights[layer]),
                      jnp.asarray(np.asarray(net.biases[layer])
                                  .reshape(1, -1))))
    prepared.append((w0, b0, deeps))


def apply_prepared(prep, x):
    w0, b0, deeps = prep
    h = _dot_bf16(x, w0) + b0
    h = celu(h.astype(jnp.bfloat16))
    for li, (w, b) in enumerate(deeps):
        h = _dot_bf16(h, w) + b
        if li < len(deeps) - 1:
            h = celu(h.astype(jnp.bfloat16))
    return h.astype(jnp.float32)                          # [n, m]


def energy_prepared(a):
    total = 0.0
    start = 0
    ga = a[jnp.asarray(grouping.order)]
    for s, count in enumerate(grouping.counts):
        if count == 0:
            continue
        block = jax.lax.slice_in_dim(ga, start, start + count, axis=0)
        e = apply_prepared(prepared[s], block)
        total = total + jnp.sum(jnp.mean(e, axis=-1))
        start += count
    return total


def f_prepared(a):
    g = jax.grad(energy_prepared)(a)
    return a + 1e-3 * g


timeit('prebuilt blockdiag bf16 fwd+bwd', f_prepared, aev)

e1 = float(ensemble_energy(params.ensemble, aev, grouping))
e2 = float(energy_prepared(aev))
print(f'parity vs f32 current: {e1:.6f} vs bf16 blockdiag {e2:.6f} '
      f'rel {abs(e1 - e2) / abs(e1):.2e}', flush=True)
print('done', flush=True)
