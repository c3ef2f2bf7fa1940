"""Fused Pallas TPU kernel for the CFConv backward chunk.

The hand-written chunked VJP (ops/cfconv._make_payload_conv) is correct and
scatter-free, but as an XLA program its per-chunk backward materializes
~6 [chunk*K, W] f32 intermediates to HBM between ops (filter recompute,
d_y2/d_y1 products, matmul operands) — measured ~40 ms/layer of slack over
the gather+compute floor at 26k (NOTES_PERF r5). This kernel runs the whole
per-chunk backward — filter recompute, all four weight-gradient
accumulations, the distance cotangent, and the self-adjoint input-gradient
rows — inside VMEM, reading each pair tensor exactly once.

Layout: grid (row-blocks x K-segments); pair tensors arrive as
[B, Ks, W] blocks (the neighbor-input and output-cotangent gathers stay in
XLA — Mosaic has no dynamic row gather); weight-gradient outputs revisit
one block across every grid step (init on the first step, accumulate
after), d_x row blocks accumulate across the K-segments of their row.

Math identical to cfconv._make_payload_conv._bwd_rows (the parity oracle,
tests/test_pallas_cfconv.py). Reference for the derivatives:
/root/reference/src/schnet/CpuCFConv.cpp:211-299 (fused value+tangent
backprop); here the per-pair filter chain is [BKs, W]-batched MXU work.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CFConvConfig

Array = jax.Array

_LN2 = float(np.log(2.0))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=32)
def make_cfconv_bwd_kernel(config: CFConvConfig, k: int,
                           interpret: Optional[bool] = None,
                           block_rows: int = 8,
                           k_seg: Optional[int] = None):
    """Build ``fn(dist, xg, gg, gc, params) ->
    (d_dist [R, k], d_x_rows [R, W], d_w1, d_b1, d_w2, d_b2)`` for one
    row-chunk (R rows, k neighbor lanes).

    dist: [R, k] f32 with EXACT ZEROS on invalid lanes (the caller's
    where-mask) — validity is recovered in-kernel as ``dist > 0`` (a
    self-pair is excluded upstream, so every real pair has r > 0). This
    saves a whole [R, k, 1] mask operand: scalar columns tile to (8, 128)
    on TPU, so each costs 128 lanes of VMEM (the mask+dist pair alone
    OOM'd scoped VMEM at block_rows 16). xg/gg: [R, k, W] gathered
    neighbor inputs / output cotangents; gc: [R, W] chunk cotangent.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    rc = float(config.cutoff)
    gw = float(config.gaussian_width)
    act_kind = config.activation
    w = int(config.width)
    g = int(config.num_gaussians)
    gp = _round_up(g, 8)
    centers_np = np.zeros((1, gp), np.float32)
    centers_np[0, :g] = np.asarray(config.gaussian_positions, np.float32)
    # Padded gaussian columns: centers FAR below any distance -> u large ->
    # gauss underflows to exact 0, so the pad lanes contribute nothing to
    # h, d_w1 rows beyond g stay zero, and d_dist picks up no pad term.
    centers_np[0, g:] = -1e6

    b = int(block_rows)
    # The [B, Ks] distance/mask blocks put the lane axis on K, so the
    # segment must be a 128-multiple; callers size the neighbor capacity
    # to one (e.g. 640 at the 26k/10 A workload — the +18% over the
    # density cap of 544 costs ~+4 ms of gather per layer and buys the
    # fused kernel; cfconv._conv_bwd falls back to the XLA path for
    # unfriendly capacities).
    ks = int(k_seg) if k_seg else min(k, 128)
    if k % ks or ks % 128:
        raise ValueError(f'k={k} must be a multiple of the 128-lane '
                         f'segment (got k_seg={ks})')
    nks = k // ks
    bk = b * ks
    inv_gw = 1.0 / gw
    pi_rc = math.pi / rc

    _dot = functools.partial(jax.lax.dot_general,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    def mm(a, bb):
        return _dot(a, bb, (((1,), (0,)), ((), ())))

    def mm_t1(a, bb):
        """a.T @ bb with contraction over rows."""
        return _dot(a, bb, (((0,), (0,)), ((), ())))

    def mm_t2(a, bb):
        """a @ bb.T."""
        return _dot(a, bb, (((1,), (1,)), ((), ())))

    def kernel(cen_ref, w1_ref, b1_ref, w2_ref, b2_ref, dist_ref,
               xg_ref, gg_ref, gc_ref, ddist_ref, dx_ref, dw1_ref, db1_ref,
               dw2_ref, db2_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        # dist/mask ride as [B, Ks, 1]: every in-kernel reshape keeps the
        # minor dim, which Mosaic requires (a [B, Ks] -> [BKs, 1] flatten
        # moves lanes to sublanes: 'unsupported shape cast' on this
        # toolchain — only leading-dim merges are layout-preserving).
        xg = xg_ref[...].reshape(bk, w)                    # [BKs, W]
        gg = gg_ref[...].reshape(bk, w)
        gc = gc_ref[...]                                   # [B, W]
        df = dist_ref[...].reshape(bk, 1)
        mf = (df > 0.0).astype(jnp.float32)
        u = (df - cen_ref[...]) * inv_gw                   # [BKs, Gp]
        gauss = jnp.exp(-0.5 * u * u)
        h = mm(gauss, w1_ref[...]) + b1_ref[...]           # [BKs, W]
        if act_kind == 'ssp':
            sig = 1.0 / (1.0 + jnp.exp(-h))
            act = jnp.maximum(h, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(h))) \
                - _LN2
        else:
            act = jnp.tanh(h)
            sig = 1.0 - act * act                          # act'
        y1 = mm(act, w2_ref[...]) + b2_ref[...]
        fc = (0.5 * jnp.cos(pi_rc * df) + 0.5) * mf
        dfc = (-0.5 * pi_rc) * jnp.sin(pi_rc * df) * mf
        t = (gc[:, None, :] * xg.reshape(b, ks, w)).reshape(bk, w)  # d_y2
        d_y1 = t * fc
        d_fcs = jnp.sum(t * y1, axis=1, keepdims=True)     # [BKs, 1]
        d_act = mm_t2(d_y1, w2_ref[...])
        d_h = d_act * sig
        d_gauss = mm_t2(d_h, w1_ref[...])
        d_d = (jnp.sum(d_gauss * gauss * (-u * inv_gw), axis=1,
                       keepdims=True) + d_fcs * dfc) * mf
        ddist_ref[...] = d_d.reshape(b, ks, 1)
        # Self-adjoint input-gradient rows: sum over this K segment.
        y2 = y1 * fc
        dxp = jnp.sum((y2 * gg).reshape(b, ks, w), axis=1)  # [B, W]

        @pl.when(j == 0)
        def _dx_init():
            dx_ref[...] = dxp

        @pl.when(j > 0)
        def _dx_acc():
            dx_ref[...] += dxp

        pw1 = mm_t1(gauss, d_h)                            # [Gp, W]
        pb1 = jnp.sum(d_h, axis=0, keepdims=True)
        pw2 = mm_t1(act, d_y1)
        pb2 = jnp.sum(d_y1, axis=0, keepdims=True)

        @pl.when((i == 0) & (j == 0))
        def _w_init():
            dw1_ref[...] = pw1
            db1_ref[...] = pb1
            dw2_ref[...] = pw2
            db2_ref[...] = pb2

        @pl.when((i > 0) | (j > 0))
        def _w_acc():
            dw1_ref[...] += pw1
            db1_ref[...] += pb1
            dw2_ref[...] += pw2
            db2_ref[...] += pb2

    def run(dist, xg, gg, gc, params):
        r = dist.shape[0]
        assert r % b == 0 and dist.shape[1] == k
        w1 = jnp.zeros((gp, w), jnp.float32).at[:g].set(
            params.w1.astype(jnp.float32))
        grid = (r // b, nks)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, gp), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gp, w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, ks, 1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, ks, w), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, ks, w), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, w), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((b, ks, 1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, w), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gp, w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((r, k, 1), jnp.float32),
                jax.ShapeDtypeStruct((r, w), jnp.float32),
                jax.ShapeDtypeStruct((gp, w), jnp.float32),
                jax.ShapeDtypeStruct((1, w), jnp.float32),
                jax.ShapeDtypeStruct((w, w), jnp.float32),
                jax.ShapeDtypeStruct((1, w), jnp.float32),
            ),
            interpret=interpret,
        )(jnp.asarray(centers_np), w1,
          params.b1.astype(jnp.float32).reshape(1, w),
          params.w2.astype(jnp.float32),
          params.b2.astype(jnp.float32).reshape(1, w),
          dist[..., None], xg, gg, gc)
        d_dist, d_x, dw1, db1, dw2, db2 = outs
        return (d_dist[..., 0], d_x, dw1[:g], db1[0], dw2, db2[0])

    return run
