"""Per-op VPU throughput on this chip: time a K-op chain over a large f32
array and report ns/element/op from the slope between two chain lengths.
Informs which transcendentals are worth replacing with polynomials in the
AEV kernels (exp/log measured cheap in probe_pow — verify cos/sin/sqrt)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
import numpy as np

N = 4 * 2 ** 20
x0 = jnp.asarray(np.random.RandomState(0).rand(N).astype(np.float32) + 0.5)

OPS = {
    'mul': lambda x: x * 1.0000001,
    'fma': lambda x: x * 1.0000001 + 1e-7,
    'sqrt': lambda x: jnp.sqrt(x),
    'rsqrt': lambda x: jax.lax.rsqrt(x) + 1.0,     # keep in [1, 2]
    'div': lambda x: 2.0 / x,
    'exp': lambda x: jnp.exp(x - 1.0),
    'log': lambda x: jnp.log(x) + 1.0,
    'cos': lambda x: jnp.cos(x) + 1.2,
    'sin': lambda x: jnp.sin(x) + 1.2,
    'tanh': lambda x: jnp.tanh(x) + 0.5,
    'pow_frac': lambda x: jnp.power(x, 0.3),
    'where': lambda x: jnp.where(x > 1.0, x, x + 1e-7),
    'cumsum128': None,   # special below
}


def chain_ms(fn, k):
    def whole(x):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(c).reshape(1)
    run = jax.jit(whole)
    float(run(x0)[0])
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0)[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


for name, fn in OPS.items():
    if fn is None:
        continue
    t1 = chain_ms(fn, 8)
    t2 = chain_ms(fn, 40)
    per = (t2 - t1) / 32
    print(f'{name}: {per:.4f} ms/pass over {N >> 20}M elems '
          f'({per * 1e6 / N:.4f} ns/elem)', flush=True)

# cumsum along 128-lane rows (the rank-compaction building block)
xr = x0.reshape(-1, 128)


def cs(k):
    def whole(x):
        def body(c, _):
            return jnp.cumsum(c, axis=1) * 0.5, None
        c, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(c).reshape(1)
    run = jax.jit(whole)
    float(run(xr)[0])
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(xr)[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


t1, t2 = cs(8), cs(40)
per = (t2 - t1) / 32
print(f'cumsum(axis=-1,128 lanes): {per:.4f} ms/pass '
      f'({per * 1e6 / N:.4f} ns/elem)', flush=True)
