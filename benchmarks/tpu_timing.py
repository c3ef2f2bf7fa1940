"""Robust chip timing through the axon tunnel.

``block_until_ready`` on the remote backend has been observed to return
before device completion (measured: an 8192^3 matmul chain "finishing" at
82,000 TFLOP/s), so every measurement here forces a HOST transfer of a
scalar (``float(...)``), and per-step costs are taken as the SLOPE between
two scan lengths — the tunnel round-trip and dispatch overheads cancel.
"""
import time

import jax
import jax.numpy as jnp


def scan_time(fn, args, steps, reps=3):
    """Seconds per jitted scan of ``steps`` chained ``fn(*args)`` calls,
    host-forced. The first arg is the carry; each call depends on the
    previous call's output sum (no caching/elision possible)."""
    def whole(x0):
        c, _ = jax.lax.scan(lambda c, _: (c + 1e-9 * jnp.sum(
            fn(c, *args[1:])).astype(c.dtype), None),
            x0, None, length=steps)
        return jnp.sum(c)

    run = jax.jit(whole)
    float(run(args[0]))                       # compile + warm
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def slope_ms(fn, args, n1=4, n2=24, reps=3):
    """ms per call via the slope between two scan lengths (tunnel latency,
    dispatch, and constant overheads cancel)."""
    t1 = scan_time(fn, args, n1, reps)
    t2 = scan_time(fn, args, n2, reps)
    return (t2 - t1) / (n2 - n1) * 1e3
