"""Fused Pallas TPU kernel for the angular AEV over species-blocked lanes.

This is the hand-scheduled version of the angular block of
``ops.aev_blocked.compute_aev_blocked`` — same math (the reference angular
symmetry function, CpuANISymmetryFunctions.cpp:183-190, TorchANI-mode 0.95
dot scale :392-393, matched against the angular hot loop of
CudaANISymmetryFunctions.cu:242-290 and its backprop :473-596), same species
-pair-major static triple tables, but:

* every intermediate ([B, T] pair quantities, the per-(rs,ts) product terms)
  lives in VMEM — the XLA formulation materializes [N, T, 32]-class tensors
  in HBM (1 GB-class at 26k atoms) and pays layout padding on every one;
* the triple expansion runs as six [B, Kat] x [Kat, T] constant selection
  matmuls on the MXU, and the species-pair reduction is a static lane-slice
  sum — no one-hot operands anywhere;
* the backward pass is a hand-derived VJP kernel (recompute strategy —
  the reference's backpropAngularFunctions does exactly this on CUDA),
  so nothing is saved between forward and backward except the inputs.

Requires a factored angular grid (single eta/zeta — true for every ANI
basis); the general per-function basis stays on the XLA path.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ANIBasis
from ..neighbors.blocked import BlockedLayout
from .aev_blocked import triple_tables
from .pallas_window import dfc_poly_t, fc_poly_t

Array = jnp.ndarray


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Degree-5 Chebyshev-node LSQ fits (benchmarks/probe_fastpow.py) for the
# dyadic fractional pow: log2(1+t)/t on t in [0,1) (abs resid 1.2e-5) and
# 2^f on f in [0,1) (resid 1.1e-7). Coefficients low-order-first.
_C_LOG = (1.4426832519485477, -0.7204423704168592, 0.4693016870332133,
          -0.3033896669269639, 0.1464336140114986, -0.034595210911174755)
_C_EXP = (0.9999998957631365, 0.6931546200032991, 0.2401407700918444,
          0.055863282659239226, 0.00894621466635782, 0.0018951072909910687)


def _selection_np(idx: np.ndarray, k: int) -> np.ndarray:
    sel = np.zeros((k, len(idx)), dtype=np.float32)   # [Kat, T]
    sel[idx, np.arange(len(idx))] = 1.0
    return sel


@functools.lru_cache(maxsize=32)
def _kernel_constants(basis: ANIBasis, layout: BlockedLayout,
                      t_pad: int) -> Tuple:
    tables = triple_tables(layout)
    t = len(tables.jj)
    tp = _round_up(max(t, 1), t_pad)
    kat = layout.ang_total
    selj = np.zeros((kat, tp), np.float32)
    selk = np.zeros((kat, tp), np.float32)
    selj[:, :t] = _selection_np(tables.jj, kat)
    selk[:, :t] = _selection_np(tables.kk, kat)
    return tables, tp, selj, selk


def make_angular_kernel(basis: ANIBasis, layout: BlockedLayout,
                        block_size: int = 128,
                        bwd_block_size: Optional[int] = None,
                        interpret: Optional[bool] = None,
                        rad_width: Optional[int] = None,
                        bwd_impl: str = 'v2',
                        dot_impl: str = 'mixed',
                        pow_impl: str = 'split',
                        fc_impl: str = 'poly',
                        red_impl: str = 'mask'):
    """Build the fused angular-AEV function for one (basis, layout).

    Returns ``fn(ang_deltas [3, N, Kat], ang_mask [N, Kat] bool) ->
    [N, n_seg * A]`` where segment s holds the (unscaled) angular sums of
    ``triple_tables(layout).pair_ids[s]``; the caller applies the 2^(1-zeta)
    scale and places segments into the full [P, A] layout (autodiff chains
    through both). Differentiable in ``ang_deltas`` via a custom VJP kernel.
    Deltas are coordinate planes (x/y/z-major, BlockedPayload layout) so the
    kernel's input reads are dense [N, K] tiles.

    ``rad_width``: when set, the function signature becomes
    ``fn(rad_deltas [3, N, rad_width], ang_mask [N, Kat])`` and the angular
    lanes are STATIC SLICES of the radial payload (the blocked selection
    orders every species block angular-first, so species block i's angular
    lanes are radial lanes [rad_off_i, rad_off_i + ang_caps_i)) — the
    per-step HBM gather only ever fetches radial lanes, and the in-kernel
    extraction is free.
    """
    # A/B impl selectors are matched by string equality downstream; a typo
    # must error here, not silently select the other branch.
    _allowed = {'bwd_impl': ('v1', 'v2'), 'dot_impl': ('highest', 'split3',
                                                       'mixed'),
                'pow_impl': ('split', 'fast'), 'fc_impl': ('poly', 'cos'),
                'red_impl': ('slice', 'mask')}
    for name, val in (('bwd_impl', bwd_impl), ('dot_impl', dot_impl),
                      ('pow_impl', pow_impl), ('fc_impl', fc_impl),
                      ('red_impl', red_impl)):
        if val not in _allowed[name]:
            raise ValueError(f'{name}={val!r} not in {_allowed[name]}')
    if basis.angular_rs_grid is None:
        raise NotImplementedError(
            'the Pallas angular kernel requires a factored angular grid '
            '(ANIBasis.from_grids with single EtaA/Zeta)')
    if interpret is None:
        # 'axon' is the experimental remote-TPU backend — a real TPU chip;
        # everything else (cpu in tests) runs the interpreter.
        interpret = jax.default_backend() not in ('tpu', 'axon')

    tables, tp, selj_np, selk_np = _kernel_constants(basis, layout, 128)
    kat = layout.ang_total
    n_seg = len(tables.pair_ids)
    rs_grid = tuple(float(x) for x in basis.angular_rs_grid)
    ts_grid = tuple(float(x) for x in basis.angular_thetas_grid)
    n_rs, n_ts = len(rs_grid), len(ts_grid)
    a_len = n_rs * n_ts
    out_w = n_seg * a_len
    eta = float(basis.angular_eta[0])
    zeta = float(basis.angular_zeta[0])
    ra = float(basis.angular_cutoff)
    torchani = bool(basis.torchani)
    segs = [(int(tables.seg_bounds[i]), int(tables.seg_bounds[i + 1]))
            for i in range(n_seg)]
    # VMEM-adaptive atom blocks: the fwd keeps ~18 [B, Tp] f32 arrays live,
    # the bwd ~46. Larger angular capacities (e.g. Verlet-skin-widened
    # windows) grow Tp; a fixed block then overflows the ~16 MB scoped VMEM
    # and Mosaic spills to HBM at integer-factor cost (measured: the 26k
    # skin=0.5 run regressed 4x before this sizing).
    _budget = 11 * 2 ** 20

    def _cap_rows(n_arrays: int, default: int) -> int:
        rows = _budget // (n_arrays * tp * 4)
        return max(8, min(default, (rows // 8) * 8))

    b = _cap_rows(18, block_size)
    bb = bwd_block_size if bwd_block_size is not None else _cap_rows(46, b)

    # The selection matmuls must NOT run at the default MXU precision: one
    # bf16 pass loses ~3 decimal digits of the coordinates (measured 1.6e-3
    # mean relative AEV error on-chip). Mosaic supports only DEFAULT and
    # HIGHEST dot precisions (HIGH raises NotImplementedError in lowering).
    # HIGHEST costs 6 bf16 passes per launch; but every matrix this kernel
    # contracts against is a CONSTANT 0/1 selection/segment matrix (exact in
    # bf16), so a hand-rolled bf16x3 — split the data operand into three
    # bf16 terms hi/mid/lo covering the full f32 mantissa, three
    # DEFAULT-precision launches, f32 accumulation — reproduces f32 exactly
    # at half the MXU pass count. Measured on 26k tier shapes (probe_dot3):
    # the FORWARD selection matmuls are launch-overhead-bound (one fused
    # HIGHEST launch beats three split launches, 0.15 vs 0.89 ms big tier)
    # while the BACKWARD matmuls are pass-bound (split3 wins 2.9 -> 1.7 /
    # 3.5 -> 2.1 ms). 'mixed' (fwd HIGHEST, bwd split3; the default) takes
    # both winners; both variants reproduce f32 bit-exactly on the fwd and
    # to ~1e-7 relative on grads.
    _dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    _split_fwd = dot_impl == 'split3'
    _split_bwd = dot_impl in ('split3', 'mixed')

    def _split3(a):
        hi = a.astype(jnp.bfloat16)
        r1 = a - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, mid, lo

    def _dot_sel(a, cst, split):
        """a @ cst for a constant 0/1 matrix ``cst``."""
        if not split:
            return _dot(a, cst.astype(jnp.float32))
        hi, mid, lo = _split3(a)
        cb = (cst if cst.dtype == jnp.bfloat16
              else cst.astype(jnp.bfloat16))
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        return (d(hi, cb) + d(mid, cb)) + d(lo, cb)

    def pair_geometry(dx, dy, dz, m, seljk, split):
        """Shared forward geometry on [B, Tp] arrays.

        Masked lanes are pushed to a far-away coordinate before expansion so
        their pairs fail the r < ra test on their own — no mask expansion
        matmuls needed (the cutoff test IS the mask). ``seljk`` is the
        [Kat, 2*Tp] horizontal concat of the j- and k-selections: one fused
        matmul per coordinate (halves the matmul-launch count vs separate
        selj/selk contractions)."""
        far = 4.0 * ra
        dxm = dx + (1.0 - m) * far
        x12 = _dot_sel(dxm, seljk, split)
        y12 = _dot_sel(dy, seljk, split)
        z12 = _dot_sel(dz, seljk, split)
        x1, x2 = x12[:, :tp], x12[:, tp:]
        y1, y2 = y12[:, :tp], y12[:, tp:]
        z1, z2 = z12[:, :tp], z12[:, tp:]
        r1 = jnp.sqrt(x1 * x1 + y1 * y1 + z1 * z1)
        r2 = jnp.sqrt(x2 * x2 + y2 * y2 + z2 * z2)
        dot12 = x1 * x2 + y1 * y2 + z1 * z2
        valid = ((r1 < ra).astype(jnp.float32)
                 * (r2 < ra).astype(jnp.float32))
        # Guard the reciprocals on PAD-t lanes where both selections are all
        # zero (r = 0): real pairs always have r > 0.
        r1 = jnp.maximum(r1, 1e-3)
        r2 = jnp.maximum(r2, 1e-3)
        inv12 = 1.0 / (r1 * r2)
        if torchani:
            cos_t = jnp.clip(0.95 * dot12 * inv12, -0.95, 0.95)
            sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
            cross = None
        else:
            cos_t = jnp.clip(dot12 * inv12, -1.0, 1.0)
            cx = y1 * z2 - z1 * y2
            cy = z1 * x2 - x1 * z2
            cz = x1 * y2 - y1 * x2
            cross = (cx, cy, cz)
            sin_t = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz,
                                         1e-12)) * inv12
        rm = 0.5 * (r1 + r2)
        if fc_impl == 'poly':
            # Cutoff function as a Horner chain in (r/ra)^2 (exact to f32;
            # see pallas_window.FC_COEFFS) — replaces cos in the fwd and
            # sin in the bwd with FMAs.
            inv_ra2 = 1.0 / (ra * ra)
            t1 = jnp.minimum(r1 * r1 * inv_ra2, 1.0)
            t2 = jnp.minimum(r2 * r2 * inv_ra2, 1.0)
            fc1 = jnp.where(r1 < ra, fc_poly_t(t1), 0.0)
            fc2 = jnp.where(r2 < ra, fc_poly_t(t2), 0.0)
        else:
            fc1 = jnp.where(r1 < ra,
                            0.5 * jnp.cos(math.pi / ra * r1) + 0.5, 0.0)
            fc2 = jnp.where(r2 < ra,
                            0.5 * jnp.cos(math.pi / ra * r2) + 0.5, 0.0)
        return ((x1, y1, z1), (x2, y2, z2), r1, r2, dot12, valid, inv12,
                cos_t, sin_t, cross, rm, fc1, fc2)

    # Uniform-grid Gaussian ladder (same identity as pallas_window): the
    # per-rs exp loop is the kernel's largest transcendental cost; for an
    # even ShfA grid each e_q follows from one center exp + one base exp by
    # two multiplies per point. rm is clamped to the cutoff first — beyond
    # it every consumer multiplies by an exact-zero vf, and unclamped
    # masked-lane distances would overflow the base (0 * inf = NaN).
    _diffs = np.diff(rs_grid) if n_rs > 1 else np.zeros(0)
    _ladder = (n_rs >= 4
               and np.all(np.abs(_diffs - _diffs[0]) < 1e-5 * abs(_diffs[0])))
    if _ladder:
        _l_d = float(_diffs[0])
        _l_c1 = math.exp(-eta * _l_d * _l_d)
        _l_c2 = _l_c1 * _l_c1

    def rs_exps(rm):
        if not _ladder:
            return [jnp.exp(-eta * (rm - rs) ** 2) for rs in rs_grid]
        rm = jnp.minimum(rm, ra)
        es = [None] * n_rs
        s0 = n_rs // 2
        u0 = rm - rs_grid[s0]
        e0 = jnp.exp(-eta * (u0 * u0))
        t = jnp.exp((2.0 * eta * _l_d) * u0)
        es[s0] = e0
        run = t * _l_c1
        cur = e0
        for q in range(s0 + 1, n_rs):
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

    _fast_pow = pow_impl == 'fast'

    def _frac_pow(base, zf):
        """base**zf for base in [1e-20, 2.05], 0 < zf < 1.

        'fast' replaces the multi-pass exp/log pair with a dyadic
        exp2/log2 built from f32 bit manipulation plus two degree-5
        polynomials (Chebyshev-node LSQ fits, benchmarks/probe_fastpow.py;
        log2 abs resid 1.2e-5, exp2 resid 1.1e-7). The log2 error is
        amplified only by zf <= 1 — the integer part of the zeta exponent
        stays on the exact binary-exponentiation path below — so the
        factor lands within ~1e-6 relative (measured over the domain)."""
        if not _fast_pow:
            return jnp.exp(zf * jnp.log(base))
        xi = jax.lax.bitcast_convert_type(base, jnp.int32)
        e = ((xi >> 23) & 0xFF).astype(jnp.float32) - 127.0
        m = jax.lax.bitcast_convert_type(
            (xi & 0x007FFFFF) | 0x3F800000, jnp.float32)
        t = m - 1.0                                  # log2(base) = e+log2(1+t)
        p = _C_LOG[-1]
        for c in _C_LOG[-2::-1]:
            p = p * t + c
        y = zf * (e + t * p)
        k = jnp.floor(y)
        f = y - k
        q = _C_EXP[-1]
        for c in _C_EXP[-2::-1]:
            q = q * f + c
        scale = jax.lax.bitcast_convert_type(
            (k.astype(jnp.int32) + 127) << 23, jnp.float32)
        return q * scale

    def pow_static(base, exponent):
        """base ** exponent with the integer part done by binary
        exponentiation: exp(z*log x) alone amplifies log's absolute error by
        z (~1.4e-3 relative at zeta=14.1, measured on-chip); the split keeps
        the amplification at frac(z) <= 1."""
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
            frac = _frac_pow(base, zf)
            result = frac if result is None else result * frac
        return result if result is not None else jnp.ones_like(base)

    def cos_pows(cos_t, sin_t):
        out = []
        for ts in ts_grid:
            cos_tm = cos_t * math.cos(ts) + sin_t * math.sin(ts)
            base = jnp.maximum(1.0 + cos_tm, 1e-20)
            out.append(pow_static(base, zeta))
        return out

    ang_slices = tuple(zip(layout.rad_offsets, layout.ang_caps))

    def slice_ang(a):
        """Angular lanes = leading sub-block of each species' radial block
        (static slices; angular-first lane order)."""
        return jnp.concatenate([a[:, ro:ro + ac] for ro, ac in ang_slices],
                               axis=1)

    def unslice_ang(blocks_dd, rows):
        """Transpose of slice_ang: place angular-lane grads back at their
        radial lane positions, zeros elsewhere."""
        pieces = []
        off = 0
        for i, (ro, ac) in enumerate(ang_slices):
            rc_i = layout.rad_caps[i]
            pieces.append(blocks_dd[:, off:off + ac])
            if rc_i > ac:
                pieces.append(jnp.zeros((rows, rc_i - ac), jnp.float32))
            off += ac
        return jnp.concatenate(pieces, axis=1)

    def fwd_body(dx, dy, dz, m, seljk, out_ref):
        (_, _, _, _, _, valid, _, cos_t, sin_t, _, rm, fc1, fc2
         ) = pair_geometry(dx, dy, dz, m, seljk, _split_fwd)
        vf = valid * fc1 * fc2
        cps = cos_pows(cos_t, sin_t)
        es = rs_exps(rm)
        if red_impl == 'mask':
            # Segment sums as DENSE full-row reductions against constant
            # 0/1 lane masks (built from iota — Pallas cannot capture array
            # constants) + ONE assembled store. The per-(rs,ts,seg)
            # unaligned slice-sums + 96 narrow column stores of the 'slice'
            # variant lower to edge-masked lane shuffles that cost ~2/3 of
            # the whole fwd kernel (probe_angablate: 2.88 -> 1.50 ms over
            # the 26k tier shapes). Same terms + exact zeros, so only the
            # reduction ORDER differs from 'slice' (rounding-level).
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
            smasks = [((lane >= t0) & (lane < t1)).astype(jnp.float32)
                      for (t0, t1) in segs]
            cv = [[None] * a_len for _ in range(n_seg)]
            for i_rs in range(n_rs):
                e = vf * es[i_rs]
                for i_ts in range(n_ts):
                    w = e * cps[i_ts]
                    for i_seg in range(n_seg):
                        cv[i_seg][i_rs * n_ts + i_ts] = jnp.sum(
                            w * smasks[i_seg], axis=1, keepdims=True)
            out_ref[:, :] = jnp.concatenate(
                [c for seg_cols in cv for c in seg_cols], axis=1)
        else:
            for i_rs in range(n_rs):
                e = vf * es[i_rs]
                for i_ts in range(n_ts):
                    w = e * cps[i_ts]
                    for i_seg, (t0, t1) in enumerate(segs):
                        col = i_seg * a_len + i_rs * n_ts + i_ts
                        out_ref[:, col] = jnp.sum(w[:, t0:t1], axis=1)

    def fwd_kernel(dx_ref, dy_ref, dz_ref, m_ref, seljk_ref, out_ref):
        fwd_body(dx_ref[:], dy_ref[:], dz_ref[:], m_ref[:],
                 seljk_ref[:], out_ref)

    def fwd_kernel_rad(dxr_ref, dyr_ref, dzr_ref, m_ref, seljk_ref,
                       out_ref):
        fwd_body(slice_ang(dxr_ref[:]), slice_ang(dyr_ref[:]),
                 slice_ang(dzr_ref[:]), m_ref[:], seljk_ref[:], out_ref)

    def bwd_tail(geom, vf, dvf, drm, c_acc, seljk):
        """Shared second half of the VJP: (dvf, drm, c_acc) -> input-delta
        cotangents. Same math in both cotangent-loop variants."""
        (d1, d2, r1, r2, dot12, valid, inv12, cos_t, sin_t, cross, rm,
         fc1, fc2) = geom
        x1, y1, z1 = d1
        x2, y2, z2 = d2
        zeros = jnp.zeros_like(rm)
        dcos = zeros
        dsin = zeros
        for i_ts, ts in enumerate(ts_grid):
            cos_tm = cos_t * math.cos(ts) + sin_t * math.sin(ts)
            base = jnp.maximum(1.0 + cos_tm, 1e-20)
            dctm = vf * c_acc[i_ts] * zeta * pow_static(base, zeta - 1.0)
            dcos = dcos + dctm * math.cos(ts)
            dsin = dsin + dctm * math.sin(ts)
        if fc_impl == 'poly':
            inv_ra2 = 1.0 / (ra * ra)
            dfc1 = (dfc_poly_t(jnp.minimum(r1 * r1 * inv_ra2, 1.0))
                    * (2.0 * inv_ra2) * r1)
            dfc2 = (dfc_poly_t(jnp.minimum(r2 * r2 * inv_ra2, 1.0))
                    * (2.0 * inv_ra2) * r2)
        else:
            dfc1 = -0.5 * math.pi / ra * jnp.sin(math.pi / ra * r1)
            dfc2 = -0.5 * math.pi / ra * jnp.sin(math.pi / ra * r2)
        dr1 = 0.5 * drm + dvf * valid * dfc1 * fc2
        dr2 = 0.5 * drm + dvf * valid * fc1 * dfc2
        if torchani:
            # sin = sqrt(1 - cos^2); cos = 0.95*dot/(r1 r2) (clip interior).
            dcos_eff = dcos - dsin * cos_t / sin_t
            ddot = 0.95 * inv12 * dcos_eff
            dr1 = dr1 - cos_t / r1 * dcos_eff
            dr2 = dr2 - cos_t / r2 * dcos_eff
            cross_d1 = cross_d2 = None
        else:
            # cos = dot/(r1 r2); sin = |d1 x d2| / (r1 r2).
            ddot = inv12 * dcos
            dr1 = dr1 - cos_t / r1 * dcos - sin_t / r1 * dsin
            dr2 = dr2 - cos_t / r2 * dcos - sin_t / r2 * dsin
            cx, cy, cz = cross
            cnorm = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, 1e-12))
            s = dsin * inv12 / cnorm
            # d|c|/d d1 = d2 x c_hat ; d|c|/d d2 = c_hat x d1.
            cross_d1 = (s * (y2 * cz - z2 * cy),
                        s * (z2 * cx - x2 * cz),
                        s * (x2 * cy - y2 * cx))
            cross_d2 = (s * (cy * z1 - cz * y1),
                        s * (cz * x1 - cx * z1),
                        s * (cx * y1 - cy * x1))
        inv_r1 = 1.0 / r1
        inv_r2 = 1.0 / r2
        dd1x = ddot * x2 + dr1 * x1 * inv_r1
        dd1y = ddot * y2 + dr1 * y1 * inv_r1
        dd1z = ddot * z2 + dr1 * z1 * inv_r1
        dd2x = ddot * x1 + dr2 * x2 * inv_r2
        dd2y = ddot * y1 + dr2 * y2 * inv_r2
        dd2z = ddot * z1 + dr2 * z2 * inv_r2
        if cross_d1 is not None:
            dd1x = dd1x + cross_d1[0]
            dd1y = dd1y + cross_d1[1]
            dd1z = dd1z + cross_d1[2]
            dd2x = dd2x + cross_d2[0]
            dd2y = dd2y + cross_d2[1]
            dd2z = dd2z + cross_d2[2]
        dd1x = dd1x * valid
        dd1y = dd1y * valid
        dd1z = dd1z * valid
        dd2x = dd2x * valid
        dd2y = dd2y * valid
        dd2z = dd2z * valid
        # One matmul per coordinate at 2*Tp contraction depth: the j/k
        # cotangents stack along the contraction axis of seljk's transpose.
        sel_t = seljk.T                                  # [2*Tp, Kat]
        ddx = _dot_sel(jnp.concatenate([dd1x, dd2x], axis=1), sel_t,
                       _split_bwd)
        ddy = _dot_sel(jnp.concatenate([dd1y, dd2y], axis=1), sel_t,
                       _split_bwd)
        ddz = _dot_sel(jnp.concatenate([dd1z, dd2z], axis=1), sel_t,
                       _split_bwd)
        return ddx, ddy, ddz

    def bwd_body(dx, dy, dz, m, g, seljk, segmask_ref):
        geom = pair_geometry(dx, dy, dz, m, seljk, _split_bwd)
        (_, _, _, _, _, valid, _, cos_t, sin_t, _, rm, fc1, fc2) = geom
        vf = valid * fc1 * fc2
        cps = cos_pows(cos_t, sin_t)
        zeros = jnp.zeros_like(rm)
        a_acc = zeros                     # dW/d(vf)
        b_acc = zeros                     # dW/d(rm) / vf
        c_acc = [zeros] * n_ts            # dW/d(cos_pow[ts]) / vf
        es = rs_exps(rm)
        for i_rs, rs in enumerate(rs_grid):
            u = rm - rs
            e_raw = es[i_rs]
            for i_ts in range(n_ts):
                # Broadcast the per-segment cotangent onto its lane range:
                # outer products against the constant 0/1 segment masks.
                gt = zeros
                for i_seg in range(n_seg):
                    col = i_seg * a_len + i_rs * n_ts + i_ts
                    gt = gt + g[:, col:col + 1] * segmask_ref[i_seg:i_seg + 1, :]
                p = gt * e_raw
                a_acc = a_acc + p * cps[i_ts]
                b_acc = b_acc + p * cps[i_ts] * (-2.0 * eta * u)
                c_acc[i_ts] = c_acc[i_ts] + p
        return bwd_tail(geom, vf, a_acc, vf * b_acc, c_acc, seljk)

    def bwd_body_v2(dx, dy, dz, m, g, seljk, segmask_ref):
        """Restructured cotangent loop: the per-(rs,ts,seg) full-width
        broadcast FMAs of v1 (~9 VPU passes per (rs,ts), n_seg of them just
        to paint the cotangent onto its lane segment) become one tiny MXU
        matmul per (rs,ts) against the constant 0/1 segment masks, and the
        rm-weighted accumulator is factored as ``sum(t)*rm - sum(t*rs)``
        (rs is a scalar) so the loop costs ~11 passes per rs instead of
        ~9*n_ts. ``g`` arrives (rs,ts)-major / seg-minor (reordered by the
        caller) so each matmul reads a contiguous [B, n_seg] slice."""
        geom = pair_geometry(dx, dy, dz, m, seljk, _split_bwd)
        (_, _, _, _, _, valid, _, cos_t, sin_t, _, rm, fc1, fc2) = geom
        vf = valid * fc1 * fc2
        cps = cos_pows(cos_t, sin_t)
        zeros = jnp.zeros_like(rm)
        a_acc = zeros                     # sum_rs e_rs * P_rs
        sb_acc = zeros                    # sum_rs e_rs * P_rs * rs (scalar rs)
        c_acc = [zeros] * n_ts            # dW/d(cos_pow[ts]) / vf
        seg = segmask_ref[...]
        es = rs_exps(rm)
        for i_rs, rs in enumerate(rs_grid):
            e_raw = es[i_rs]
            p_rs = zeros
            for i_ts in range(n_ts):
                k0 = (i_rs * n_ts + i_ts) * n_seg
                gt = _dot_sel(g[:, k0:k0 + n_seg], seg,
                              _split_bwd)                    # [B, Tp] MXU
                p_rs = p_rs + gt * cps[i_ts]
                c_acc[i_ts] = c_acc[i_ts] + gt * e_raw
            t_rs = e_raw * p_rs
            a_acc = a_acc + t_rs
            sb_acc = sb_acc + t_rs * rs
        drm = vf * (-2.0 * eta) * (a_acc * rm - sb_acc)
        return bwd_tail(geom, vf, a_acc, drm, c_acc, seljk)

    _bwd_body = bwd_body_v2 if bwd_impl == 'v2' else bwd_body

    def bwd_kernel(dx_ref, dy_ref, dz_ref, m_ref, g_ref, seljk_ref,
                   segmask_ref, ddx_ref, ddy_ref, ddz_ref):
        ddx, ddy, ddz = _bwd_body(dx_ref[:], dy_ref[:], dz_ref[:], m_ref[:],
                                  g_ref[:], seljk_ref[:], segmask_ref)
        ddx_ref[:] = ddx
        ddy_ref[:] = ddy
        ddz_ref[:] = ddz

    def bwd_kernel_rad(dxr_ref, dyr_ref, dzr_ref, m_ref, g_ref, seljk_ref,
                       segmask_ref, ddxr_ref, ddyr_ref, ddzr_ref):
        rows = dxr_ref.shape[0]
        ddx, ddy, ddz = _bwd_body(
            slice_ang(dxr_ref[:]), slice_ang(dyr_ref[:]),
            slice_ang(dzr_ref[:]), m_ref[:], g_ref[:],
            seljk_ref[:], segmask_ref)
        # Static transpose of the slicing: grads land back at the angular
        # sub-block of each species' radial lanes.
        ddxr_ref[:] = unslice_ang(ddx, rows)
        ddyr_ref[:] = unslice_ang(ddy, rows)
        ddzr_ref[:] = unslice_ang(ddz, rows)

    # Keep kernel constants as NUMPY: the factory may run inside a jit trace
    # (first call), and a jnp array created there is a tracer — caching it
    # would leak it into later traces. numpy converts per-trace at use.
    segmask_np = np.zeros((n_seg, tp), np.float32)
    for i_seg, (t0, t1) in enumerate(segs):
        segmask_np[i_seg, t0:t1] = 1.0
    seljk_np = np.concatenate([selj_np, selk_np], axis=1)   # [Kat, 2*Tp]
    # 0/1 selections are exact in bf16: ship them pre-converted on split
    # paths so the kernel never converts the constant per grid step.
    _fwd_dtype = jnp.bfloat16 if _split_fwd else jnp.float32
    _bwd_dtype = jnp.bfloat16 if _split_bwd else jnp.float32
    full_spec = pl.BlockSpec((kat, 2 * tp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((n_seg, tp), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def row_spec(width, rows=None):
        return pl.BlockSpec((rows or b, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    lane_w = rad_width if rad_width is not None else kat
    kfwd = fwd_kernel_rad if rad_width is not None else fwd_kernel
    kbwd = bwd_kernel_rad if rad_width is not None else bwd_kernel

    def lane_spec(rows):
        return pl.BlockSpec((rows, lane_w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def aux_spec(rows):
        # Angular mask [*, Kat] f32 (both modes).
        return pl.BlockSpec((rows, kat), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def run_fwd(dx, dy, dz, aux):
        n = dx.shape[0]
        grid = (n // b,)
        return pl.pallas_call(
            kfwd,
            grid=grid,
            in_specs=[lane_spec(b)] * 3 + [aux_spec(b), full_spec],
            out_specs=row_spec(out_w),
            out_shape=jax.ShapeDtypeStruct((n, out_w), jnp.float32),
            interpret=interpret,
        )(dx, dy, dz, aux, jnp.asarray(seljk_np, dtype=_fwd_dtype))

    def run_bwd(dx, dy, dz, aux, g):
        n = dx.shape[0]
        grid = (n // bb,)
        return pl.pallas_call(
            kbwd,
            grid=grid,
            in_specs=[lane_spec(bb)] * 3 + [aux_spec(bb), row_spec(out_w, bb),
                                            full_spec, seg_spec],
            out_specs=(lane_spec(bb),) * 3,
            out_shape=tuple(jax.ShapeDtypeStruct((n, lane_w), jnp.float32)
                            for _ in range(3)),
            interpret=interpret,
        )(dx, dy, dz, aux, g, jnp.asarray(seljk_np, dtype=_bwd_dtype),
          jnp.asarray(segmask_np, dtype=_bwd_dtype))

    def split_pad(deltas, aux, pad):
        # deltas: [3, N, lane_w] coordinate planes — the leading-axis slices
        # are full dense tiles (no lane-padded [N, K, 3] reads anywhere).
        dx = deltas[0]
        dy = deltas[1]
        dz = deltas[2]
        aux = aux.astype(jnp.float32)
        if pad:
            z = jnp.zeros((pad, lane_w), jnp.float32)
            dx, dy, dz = (jnp.concatenate([a, z]) for a in (dx, dy, dz))
            aux = jnp.concatenate([aux, jnp.zeros((pad, kat), jnp.float32)])
        return dx, dy, dz, aux

    @jax.custom_vjp
    def angular(deltas, aux):
        return _fwd(deltas, aux)[0]

    def _fwd(deltas, aux):
        n = deltas.shape[1]
        dx, dy, dz, auxp = split_pad(deltas, aux, (-n) % b)
        out = run_fwd(dx, dy, dz, auxp)[:n]
        return out, (deltas, aux)

    def _bwd(res, g):
        deltas, aux = res
        n = deltas.shape[1]
        pad = (-n) % bb
        dx, dy, dz, auxp = split_pad(deltas, aux, pad)
        gg = g
        if bwd_impl == 'v2':
            # v2 reads contiguous [B, n_seg] cotangent slices per (rs,ts):
            # permute seg-major columns to (rs,ts)-major / seg-minor.
            gg = gg.reshape(n, n_seg, a_len).transpose(0, 2, 1).reshape(
                n, out_w)
        if pad:
            gg = jnp.concatenate([gg, jnp.zeros((pad, out_w), jnp.float32)])
        ddx, ddy, ddz = run_bwd(dx, dy, dz, auxp, gg)
        dd = jnp.stack([ddx[:n], ddy[:n], ddz[:n]])
        return dd, None

    angular.defvjp(lambda d, a: _fwd(d, a), _bwd)
    return angular


_ANGULAR_CACHE: dict = {}


def angular_aev_pallas(ang_deltas: Array, ang_mask: Array, basis: ANIBasis,
                       layout: BlockedLayout, block_size: int = 128,
                       interpret: Optional[bool] = None,
                       rad_width: Optional[int] = None,
                       bwd_impl: str = 'v2',
                       dot_impl: str = 'mixed',
                       pow_impl: str = 'split',
                       fc_impl: str = 'poly',
                       red_impl: str = 'mask') -> Array:
    """Full angular AEV [N, P*A] via the fused kernel: kernel segments placed
    into the reference layout and scaled by 2^(1-zeta) (autodiff chains
    through the placement).

    With ``rad_width`` set, ``ang_deltas`` is the RADIAL payload
    [N, rad_width, 3] (the angular lanes are static slices of it)."""
    key = (basis, layout, block_size, interpret, rad_width, bwd_impl,
           dot_impl, pow_impl, fc_impl, red_impl)
    if key not in _ANGULAR_CACHE:
        _ANGULAR_CACHE[key] = make_angular_kernel(
            basis, layout, block_size=block_size, interpret=interpret,
            rad_width=rad_width, bwd_impl=bwd_impl, dot_impl=dot_impl,
            pow_impl=pow_impl, fc_impl=fc_impl, red_impl=red_impl)
    fn = _ANGULAR_CACHE[key]
    raw = fn(ang_deltas, ang_mask)                 # [N, n_seg * A]
    n = raw.shape[0]
    tables = triple_tables(layout)
    a_len = len(basis.angular_rs_grid) * len(basis.angular_thetas_grid)
    num_pairs = basis.num_species_pairs
    cols = [jnp.zeros((n, a_len), raw.dtype)] * num_pairs
    for i_seg, pid in enumerate(tables.pair_ids):
        seg = raw[:, i_seg * a_len:(i_seg + 1) * a_len]
        cols[pid] = cols[pid] + seg
    angular = jnp.stack(cols, axis=1)              # [N, P, A]
    scale = 2.0 ** (1.0 - float(basis.angular_zeta[0]))
    return (angular * scale).reshape(n, num_pairs * a_len)
