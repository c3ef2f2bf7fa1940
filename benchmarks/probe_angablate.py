"""Ablate the angular fwd kernel's internal stages at production tier
shapes to locate the gap between measured (~3.6 ms fwd over 3 tiers) and
the ~1 ms op-count floor (NOTES_PERF round-3 roofline).

Standalone replica of ops/pallas_aev.py fwd_body (same shapes, same math)
with stages switchable:
  geom      selection matmuls + r1/r2/dot/fc (pair_geometry)
  pows      cos_pows: 4x pow_static(base, 14.1)
  ladder    rs_exps: 8-step uniform-grid Gaussian ladder
  prodred   32x (product + per-seg slice sums) + 96 column stores
  mxred     alt: per-(rs,ts) segment reduce as one row-stacked MXU matmul
Variants time cumulative subsets so differences attribute each stage.
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

jax.config.update('jax_compilation_cache_dir', '/tmp/jaxcache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

print('devices:', jax.devices(), flush=True)

ETA, ZETA, RA = 12.5, 14.1, 3.5
N_RS, N_TS = 8, 4
RS = tuple(0.8 + (3.5 - 0.8) / N_RS * i for i in range(N_RS))
TS = tuple(math.pi / (2 * N_TS) + math.pi / N_TS * i for i in range(N_TS))

# production 26k tier shapes: (rows, Kat, Tp_true, seg bounds)
TIERS = [(936, 48, 1128), (13858, 29, 406), (11216, 24, 276)]
N_SEG = 3


def _round_up(x, m):
    return -(-x // m) * m


def build(rows, kat, t_true, stages, seed=0):
    tp = _round_up(t_true, 128)
    rng = np.random.RandomState(seed)
    # triple tables: j < k lane pairs, species-pair-major segments
    jj, kk = np.triu_indices(kat, 1)
    jj, kk = jj[:t_true], kk[:t_true]
    selj = np.zeros((kat, tp), np.float32)
    selk = np.zeros((kat, tp), np.float32)
    selj[jj, np.arange(t_true)] = 1.0
    selk[kk, np.arange(t_true)] = 1.0
    seljk = np.concatenate([selj, selk], axis=1)          # [Kat, 2Tp]
    sb = np.linspace(0, t_true, N_SEG + 1).astype(int)
    segs = [(int(sb[i]), int(sb[i + 1])) for i in range(N_SEG)]
    out_w = N_SEG * N_RS * N_TS

    _dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    _diffs = np.diff(RS)
    _l_d = float(_diffs[0])
    _l_c1 = math.exp(-ETA * _l_d * _l_d)
    _l_c2 = _l_c1 * _l_c1

    def rs_exps(rm):
        rm = jnp.minimum(rm, RA)
        es = [None] * N_RS
        s0 = N_RS // 2
        u0 = rm - RS[s0]
        e0 = jnp.exp(-ETA * (u0 * u0))
        t = jnp.exp((2.0 * ETA * _l_d) * u0)
        es[s0] = e0
        run = t * _l_c1
        cur = e0
        for q in range(s0 + 1, N_RS):
            cur = cur * run
            es[q] = cur
            run = run * _l_c2
        t_inv = 1.0 / t
        run = t_inv * _l_c1
        cur = e0
        for q in range(s0 - 1, -1, -1):
            cur = cur * run
            es[q] = cur
            run = run * _l_c2
        return es

    def pow_static(base, exponent):
        zi = int(math.floor(exponent))
        zf = exponent - zi
        result = None
        sq = base
        k = zi
        while k:
            if k & 1:
                result = sq if result is None else result * sq
            k >>= 1
            if k:
                sq = sq * sq
        if zf > 1e-12:
            frac = jnp.exp(zf * jnp.log(base))
            result = frac if result is None else result * frac
        return result

    def kernel(dx_ref, dy_ref, dz_ref, m_ref, seljk_ref, out_ref):
        dx, dy, dz, m = dx_ref[:], dy_ref[:], dz_ref[:], m_ref[:]
        far = 4.0 * RA
        dxm = dx + (1.0 - m) * far
        x12 = _dot(dxm, seljk_ref[:])
        y12 = _dot(dy, seljk_ref[:])
        z12 = _dot(dz, seljk_ref[:])
        x1, x2 = x12[:, :tp], x12[:, tp:]
        y1, y2 = y12[:, :tp], y12[:, tp:]
        z1, z2 = z12[:, :tp], z12[:, tp:]
        r1 = jnp.sqrt(x1 * x1 + y1 * y1 + z1 * z1)
        r2 = jnp.sqrt(x2 * x2 + y2 * y2 + z2 * z2)
        dot12 = x1 * x2 + y1 * y2 + z1 * z2
        valid = (r1 < RA).astype(jnp.float32) * (r2 < RA).astype(jnp.float32)
        r1 = jnp.maximum(r1, 1e-3)
        r2 = jnp.maximum(r2, 1e-3)
        inv12 = 1.0 / (r1 * r2)
        cos_t = jnp.clip(0.95 * dot12 * inv12, -0.95, 0.95)
        sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
        rm = 0.5 * (r1 + r2)
        # fc poly (same degree as fc_poly_t: Horner in t = (r/ra)^2, deg 5)
        inv_ra2 = 1.0 / (RA * RA)
        C = (1.0, -2.5, 1.7, -0.6, 0.45, -0.05)

        def fcp(t):
            p = C[-1]
            for c in C[-2::-1]:
                p = p * t + c
            return p
        fc1 = jnp.where(r1 < RA, fcp(jnp.minimum(r1 * r1 * inv_ra2, 1.0)),
                        0.0)
        fc2 = jnp.where(r2 < RA, fcp(jnp.minimum(r2 * r2 * inv_ra2, 1.0)),
                        0.0)
        vf = valid * fc1 * fc2

        if 'pows' in stages:
            cps = []
            for ts in TS:
                cos_tm = cos_t * math.cos(ts) + sin_t * math.sin(ts)
                base = jnp.maximum(1.0 + cos_tm, 1e-20)
                cps.append(pow_static(base, ZETA))
        else:
            cps = [cos_t + float(i) for i in range(N_TS)]

        if 'ladder' in stages:
            es = rs_exps(rm)
        else:
            es = [rm + float(i) for i in range(N_RS)]

        if 'prodred' in stages:
            for i_rs in range(N_RS):
                e = vf * es[i_rs]
                for i_ts in range(N_TS):
                    w = e * cps[i_ts]
                    for i_seg, (t0, t1) in enumerate(segs):
                        col = i_seg * (N_RS * N_TS) + i_rs * N_TS + i_ts
                        out_ref[:, col] = jnp.sum(w[:, t0:t1], axis=1)
        elif 'onestore' in stages:
            # same sliced reductions, but assemble [B, 96] in registers and
            # store ONCE (96 [B,1] column stores suspected dominant).
            cv = [[None] * (N_RS * N_TS) for _ in range(N_SEG)]
            for i_rs in range(N_RS):
                e = vf * es[i_rs]
                for i_ts in range(N_TS):
                    w = e * cps[i_ts]
                    for i_seg, (t0, t1) in enumerate(segs):
                        cv[i_seg][i_rs * N_TS + i_ts] = jnp.sum(
                            w[:, t0:t1], axis=1, keepdims=True)
            cols_all = jnp.concatenate([c for seg in cv for c in seg], axis=1)
            pad_w = out_ref.shape[1] - N_SEG * N_RS * N_TS
            out_ref[:, :] = jnp.concatenate(
                [cols_all, jnp.zeros((cols_all.shape[0], pad_w),
                                     jnp.float32)], axis=1)
        elif 'maskred' in stages:
            # full-row reductions with constant 0/1 segment masks (dense,
            # tile-aligned) + one store.
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
            smasks = [((lane >= t0) & (lane < t1)).astype(jnp.float32)
                      for (t0, t1) in segs]
            cv = [[None] * (N_RS * N_TS) for _ in range(N_SEG)]
            for i_rs in range(N_RS):
                e = vf * es[i_rs]
                for i_ts in range(N_TS):
                    w = e * cps[i_ts]
                    for i_seg in range(N_SEG):
                        cv[i_seg][i_rs * N_TS + i_ts] = jnp.sum(
                            w * smasks[i_seg], axis=1, keepdims=True)
            cols_all = jnp.concatenate([c for seg in cv for c in seg], axis=1)
            pad_w = out_ref.shape[1] - N_SEG * N_RS * N_TS
            out_ref[:, :] = jnp.concatenate(
                [cols_all, jnp.zeros((cols_all.shape[0], pad_w),
                                     jnp.float32)], axis=1)
        elif 'mxured' in stages:
            # segment sums as ONE stacked MXU matmul: rows of all 32 w's
            # concatenated along lanes, against a block-diagonal [32*Tp, 96]
            # 0/1 constant, bf16 data operand (precision probe separate).
            row = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
            sj = jnp.concatenate(
                [((row >= t0) & (row < t1)).astype(jnp.bfloat16)
                 for (t0, t1) in segs], axis=1)
            cv = [[None] * (N_RS * N_TS) for _ in range(N_SEG)]
            for i_rs in range(N_RS):
                e = vf * es[i_rs]
                for i_ts in range(N_TS):
                    w = e * cps[i_ts]
                    r3 = jnp.dot(w.astype(jnp.bfloat16), sj,
                                 preferred_element_type=jnp.float32)
                    for i_seg in range(N_SEG):
                        cv[i_seg][i_rs * N_TS + i_ts] = r3[:, i_seg:i_seg
                                                           + 1]
            cols_all = jnp.concatenate([c for seg in cv for c in seg], axis=1)
            pad_w = out_ref.shape[1] - N_SEG * N_RS * N_TS
            out_ref[:, :] = jnp.concatenate(
                [cols_all, jnp.zeros((cols_all.shape[0], pad_w),
                                     jnp.float32)], axis=1)
        elif 'prodonly' in stages:
            acc = jnp.zeros((dx.shape[0], tp), jnp.float32)
            for i_rs in range(N_RS):
                e = vf * es[i_rs]
                for i_ts in range(N_TS):
                    acc = acc + e * cps[i_ts]
            out_ref[:, :] = jnp.broadcast_to(
                jnp.sum(acc, axis=1, keepdims=True),
                (dx.shape[0], out_ref.shape[1]))
        else:
            acc = vf + cps[0] + es[0]
            out_ref[:, :] = jnp.broadcast_to(
                jnp.sum(acc, axis=1, keepdims=True),
                (dx.shape[0], out_ref.shape[1]))

    budget = 11 * 2 ** 20
    b = max(8, min(128, (budget // (18 * tp * 4) // 8) * 8))
    npad = _round_up(rows, b)

    ow = _round_up(out_w, 128)

    def run(dx, dy, dz, m):
        return pl.pallas_call(
            kernel,
            grid=(npad // b,),
            in_specs=[pl.BlockSpec((b, kat), lambda i: (i, 0))] * 4
            + [pl.BlockSpec((kat, 2 * tp), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((b, ow), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((npad, ow), jnp.float32),
        )(dx, dy, dz, m, jnp.asarray(seljk))

    dx = jnp.asarray(rng.rand(npad, kat) * 3 - 1.5, jnp.float32)
    dy = jnp.asarray(rng.rand(npad, kat) * 3 - 1.5, jnp.float32)
    dz = jnp.asarray(rng.rand(npad, kat) * 3 - 1.5, jnp.float32)
    m = jnp.asarray(rng.rand(npad, kat) < 0.6, jnp.float32)
    return run, (dx, dy, dz, m)


def timeit(fn, args):
    # block_until_ready lies through the axon tunnel (see tpu_timing.py):
    # host-force a scalar and take the slope between two scan lengths.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tpu_timing import slope_ms
    return slope_ms(fn, args)


VARIANTS = [
    ('g+p+l+prodonly', frozenset({'pows', 'ladder', 'prodonly'})),
    ('FULL (prodred)', frozenset({'pows', 'ladder', 'prodred'})),
    ('FULL (onestore)', frozenset({'pows', 'ladder', 'onestore'})),
    ('FULL (maskred)', frozenset({'pows', 'ladder', 'maskred'})),
    ('FULL (mxured)', frozenset({'pows', 'ladder', 'mxured'})),
]

tot = {name: 0.0 for name, _ in VARIANTS}
for rows, kat, t_true in TIERS:
    print(f'--- tier rows={rows} Kat={kat} T={t_true} ---', flush=True)
    for name, stages in VARIANTS:
        run, args = build(rows, kat, t_true, stages)
        dt = timeit(run, args)
        tot[name] += dt
        print(f'  {name}: {dt:.3f} ms', flush=True)
print('--- totals over 3 tiers ---')
for name, _ in VARIANTS:
    print(f'  {name}: {tot[name]:.3f} ms', flush=True)
