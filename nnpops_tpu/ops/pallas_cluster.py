"""Cluster-pair radial AEV — a Pallas TPU kernel over compacted j-cluster
lists.

The dense per-cell window kernel (``ops.pallas_window``) scans a 27-cell
candidate window of ``27 * sum(cell_caps)`` lanes per center row — at water
density only ~5% of those lane slots are true neighbors (the window volume
is ~7x the cutoff sphere and per-cell capacities hold the max occupancy
while cells sit near the mean). This kernel replaces the dense window with
the classic cluster-pair decomposition (the same idea as the reference's
compacted per-atom neighbor lists, CudaANISymmetryFunctions.cu:149-226, and
GROMACS-style cluster lists) made TPU-shaped:

* atoms are packed into species-pure clusters of ``cl`` (=8) atoms by a
  spatial snake sort (``neighbors.clusters``) — clusters are always FULL,
  so there is no occupancy padding at all, and species-pure clusters keep
  every per-species reduction a static lane slice;
* each i-cluster carries a compacted list of j-clusters (anything whose
  axis-aligned bounding box comes within the cutoff+skin), gathered per
  step at CLUSTER granularity (~100x fewer gather rows than per-atom
  lists — row count, not width, is what gathers cost on TPU);
* the kernel computes the [cl, lanes] pair block of one i-cluster at a
  time, ``ib_block`` i-clusters per grid step to amortize grid overhead;
  per-species reductions are static lane slices (j-species-major lane
  layout), the i-cluster's own cluster sits at j-slot 0 of its own
  species' block so the self-pair mask is the static ``lane == off + row``;
* measured at 26k atoms: ~21M pair slots vs the window kernel's 51M.

The backward pass recomputes pair geometry (the reference CUDA backprop
strategy) and emits per-lane cotangents; the scatter back to atoms is the
frozen cluster-granular mirror gather built at refresh time
(``neighbors.clusters.gather_j_planes``).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_window import FAR, make_radial_ladder

Array = jnp.ndarray


def make_cluster_radial_kernel(radial_cutoff: float,
                               radial_eta: Sequence[float],
                               radial_rs: Sequence[float],
                               cl: int,
                               lane_caps: Tuple[int, ...],
                               self_block: int,
                               torchani: bool,
                               ib_block: int = 8,
                               interpret: Optional[bool] = None):
    """Build the fused cluster-radial function for one i-species.

    Returns ``fn(jx, jy, jz, centers) -> [ncl, cl, P*R]`` where

    * ``jx/jy/jz``: [ncl, lanes] gathered j-atom coordinate planes in
      j-species-major, j-slot-major lane order (``lanes = sum(lane_caps) *
      cl``; image shifts already applied; empty slots FAR),
    * ``centers``: [ncl, cl, 3] the i-clusters' own atom positions,
    * ``lane_caps``: per-present-species j-cluster capacities,
    * ``self_block``: this i-species' index into ``lane_caps`` — the
      i-cluster itself must be at j-slot 0 of that block, which makes the
      self-pair mask the static ``lane == off[self_block] + row``,
    * output column ``p * R + q`` = unnormalized radial function q against
      present-species p.

    Differentiable in all inputs via a custom VJP kernel (recompute
    strategy). ``ncl`` must be a multiple of ``ib_block``.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ('tpu', 'axon')
    rc = float(radial_cutoff)
    rs_list = tuple(float(x) for x in radial_rs)
    n_r = len(rs_list)
    etas = tuple(float(x) for x in radial_eta)
    if len(etas) == 1:
        etas = etas * n_r
    if len(etas) != n_r:
        raise ValueError('radial_eta must have length 1 or len(radial_rs)')
    cl = int(cl)
    lane_caps = tuple(int(x) for x in lane_caps)
    npres = len(lane_caps)
    lanes = sum(lane_caps) * cl
    out_w = npres * n_r
    scale = 0.25 if torchani else 1.0
    offs = np.cumsum((0,) + tuple(c * cl for c in lane_caps))
    sp_bounds = [(int(offs[j]), int(offs[j + 1])) for j in range(npres)]
    self_off = int(offs[self_block])
    ib = int(ib_block)

    iter_radial_exps = make_radial_ladder(rc, etas, rs_list)

    def pair_geometry(jx, jy, jz, ctr):
        """[cl, lanes] pair r/fc from one cluster's [1, lanes] j-planes and
        [cl, 3] centers. Self-pairs excluded by the static lane identity;
        empty slots fail the cutoff via the FAR sentinel."""
        dx = jx - ctr[:, 0:1]
        dy = jy - ctr[:, 1:2]
        dz = jz - ctr[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        lane = jax.lax.broadcasted_iota(jnp.int32, (cl, lanes), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (cl, lanes), 0)
        valid = (d2 < rc * rc) & (lane != row + self_off)
        r = jnp.sqrt(jnp.maximum(d2, 1e-12))
        fc = jnp.where(valid, 0.5 * jnp.cos(math.pi / rc * r) + 0.5, 0.0)
        return dx, dy, dz, r, fc, valid

    def fwd_kernel(jx_ref, jy_ref, jz_ref, ctr_ref, out_ref):
        for i in range(ib):
            jx = jx_ref[i:i + 1]                         # [1, lanes]
            jy = jy_ref[i:i + 1]
            jz = jz_ref[i:i + 1]
            ctr = ctr_ref[i]                             # [cl, 3]
            _, _, _, r, fc, _ = pair_geometry(jx, jy, jz, ctr)
            cols = [None] * out_w
            for q, e in iter_radial_exps(r):
                we = fc * e                              # [cl, lanes]
                for s, (b0, b1) in enumerate(sp_bounds):
                    cols[s * n_r + q] = scale * jnp.sum(
                        we[:, b0:b1], axis=1, keepdims=True)
            out_ref[i] = jnp.concatenate(cols, axis=1)   # [cl, out_w]

    def bwd_kernel(jx_ref, jy_ref, jz_ref, ctr_ref, g_ref,
                   djx_ref, djy_ref, djz_ref, dctr_ref):
        for i in range(ib):
            jx = jx_ref[i:i + 1]
            jy = jy_ref[i:i + 1]
            jz = jz_ref[i:i + 1]
            ctr = ctr_ref[i]
            gg = g_ref[i]                                # [cl, out_w]
            dx, dy, dz, r, fc, valid = pair_geometry(jx, jy, jz, ctr)
            dfc = jnp.where(valid, -0.5 * math.pi / rc * jnp.sin(
                math.pi / rc * r), 0.0)
            acc = [jnp.zeros((cl, b1 - b0), jnp.float32)
                   for b0, b1 in sp_bounds]
            bcc = [jnp.zeros((cl, b1 - b0), jnp.float32)
                   for b0, b1 in sp_bounds]
            for q, e in iter_radial_exps(r):
                eu = e * (etas[q] * (r - rs_list[q]))
                for s, (b0, b1) in enumerate(sp_bounds):
                    gq = gg[:, s * n_r + q:s * n_r + q + 1]   # [cl, 1]
                    acc[s] = acc[s] + gq * e[:, b0:b1]
                    bcc[s] = bcc[s] + gq * eu[:, b0:b1]
            alpha = jnp.concatenate(
                [dfc[:, b0:b1] * acc[s] - 2.0 * fc[:, b0:b1] * bcc[s]
                 for s, (b0, b1) in enumerate(sp_bounds)], axis=1)
            coef = (scale * alpha) / r                   # 0 on invalid pairs
            gx = coef * dx
            gy = coef * dy
            gz = coef * dz
            djx_ref[i:i + 1] = jnp.sum(gx, axis=0, keepdims=True)
            djy_ref[i:i + 1] = jnp.sum(gy, axis=0, keepdims=True)
            djz_ref[i:i + 1] = jnp.sum(gz, axis=0, keepdims=True)
            dctr_ref[i] = jnp.concatenate(
                [-jnp.sum(gx, axis=1, keepdims=True),
                 -jnp.sum(gy, axis=1, keepdims=True),
                 -jnp.sum(gz, axis=1, keepdims=True)], axis=1)

    def lane_spec():
        return pl.BlockSpec((ib, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def ctr_spec():
        return pl.BlockSpec((ib, cl, 3), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def out_spec():
        return pl.BlockSpec((ib, cl, out_w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def run_fwd(jx, jy, jz, centers):
        ncl = jx.shape[0]
        assert ncl % ib == 0, (ncl, ib)
        return pl.pallas_call(
            fwd_kernel,
            grid=(ncl // ib,),
            in_specs=[lane_spec()] * 3 + [ctr_spec()],
            out_specs=out_spec(),
            out_shape=jax.ShapeDtypeStruct((ncl, cl, out_w), jnp.float32),
            interpret=interpret,
        )(jx, jy, jz, centers)

    def run_bwd(jx, jy, jz, centers, g):
        ncl = jx.shape[0]
        djx, djy, djz, dctr = pl.pallas_call(
            bwd_kernel,
            grid=(ncl // ib,),
            in_specs=[lane_spec()] * 3 + [ctr_spec(), out_spec()],
            out_specs=(lane_spec(), lane_spec(), lane_spec(), ctr_spec()),
            out_shape=(jax.ShapeDtypeStruct((ncl, lanes), jnp.float32),
                       jax.ShapeDtypeStruct((ncl, lanes), jnp.float32),
                       jax.ShapeDtypeStruct((ncl, lanes), jnp.float32),
                       jax.ShapeDtypeStruct((ncl, cl, 3), jnp.float32)),
            interpret=interpret,
        )(jx, jy, jz, centers, g)
        return djx, djy, djz, dctr

    @jax.custom_vjp
    def cluster_radial(jx, jy, jz, centers):
        return run_fwd(jx, jy, jz, centers)

    def _fwd(jx, jy, jz, centers):
        return run_fwd(jx, jy, jz, centers), (jx, jy, jz, centers)

    def _bwd(res, g):
        jx, jy, jz, centers = res
        return run_bwd(jx, jy, jz, centers, g.astype(jnp.float32))

    cluster_radial.defvjp(_fwd, _bwd)
    return cluster_radial


_KERNEL_CACHE: dict = {}


def cluster_radial_aev(jx: Array, jy: Array, jz: Array, centers: Array,
                       radial_cutoff: float, radial_eta: Sequence[float],
                       radial_rs: Sequence[float], cl: int,
                       lane_caps: Tuple[int, ...], self_block: int,
                       torchani: bool, ib_block: int = 8,
                       interpret: Optional[bool] = None) -> Array:
    """Cached-kernel entry: [ncl, cl, P*R] radial AEV in cluster-slot
    order for one i-species."""
    key = (radial_cutoff, tuple(float(x) for x in radial_eta),
           tuple(float(x) for x in radial_rs), int(cl),
           tuple(int(x) for x in lane_caps), int(self_block), torchani,
           int(ib_block), interpret)
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = make_cluster_radial_kernel(
            radial_cutoff, radial_eta, radial_rs, cl, lane_caps, self_block,
            torchani, ib_block=ib_block, interpret=interpret)
    return _KERNEL_CACHE[key](jx, jy, jz, centers)
