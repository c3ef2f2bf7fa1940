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
    'cos': lambda x: jnp.cos(x) + 1.2,
    'sin': lambda x: jnp.sin(x) + 1.2,
    'cumsum128': None,   # special below
}


def chain_ms(fn, k):
    """k UNROLLED dependent ops inside one jit: XLA fuses the chain into a
    single kernel, so the slope in k isolates VPU compute from the (fixed)
    HBM roundtrip. A lax.scan variant measures only the carry's HBM
    traffic (first version of this probe: every op "cost" ~0.08 ms = 32 MB
    / BW, slopes pure noise)."""
    def whole(x):
        for _ in range(k):
            x = fn(x)
        return jnp.sum(x).reshape(1)
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
    t1 = chain_ms(fn, 16)
    t2 = chain_ms(fn, 80)
    per = (t2 - t1) / 64
    print(f'{name}: {per:.4f} ms/pass over {N >> 20}M elems '
          f'({per * 1e6 / N:.4f} ns/elem)', flush=True)

# cumsum along 128-lane rows (the rank-compaction building block)
xr = x0.reshape(-1, 128)


def cs(k):
    def whole(x):
        for _ in range(k):
            x = jnp.cumsum(x, axis=1) * 1e-6
        return jnp.sum(x).reshape(1)
    run = jax.jit(whole)
    float(run(xr)[0])
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(xr)[0])
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


t1, t2 = cs(4), cs(16)
per = (t2 - t1) / 12
print(f'cumsum(axis=-1,128 lanes): {per:.4f} ms/pass '
      f'({per * 1e6 / N:.4f} ns/elem)', flush=True)
