"""Species-pure cluster decomposition for the cluster-pair radial kernel.

Atoms are packed into clusters of ``cl`` (=8) atoms per species by a
QUANTILE-column sort: equal-count x-rank slabs, equal-count y-rank columns
within each slab, z-sorted within each column, chunked into clusters. The
equal-count construction makes every column's atom count a STATIC integer
(derived from the species count and grid alone), so cluster membership
never overflows, column boundaries adapt to density fluctuations, and the
sorted-rank -> slot map is a static vector (three [n_s] sorts per species
per refresh, nothing else). Each i-cluster carries a compacted list of
j-clusters (anything whose axis-aligned bounding box comes within
cutoff+skin), built brute-force at CLUSTER granularity per refresh
([ncl_i, ncl_j] centroid tests — ~11M entries at 26k atoms, cheap).

vs the dense per-cell window (``neighbors.window``): clusters are always
full (no occupancy padding), ~2.4x fewer kernel pair slots at 26k, and the
per-step gather is cluster-granular (~330k rows of 96 B instead of the
per-atom row counts that made compacted lists latency-bound in round 1).

Capacity contract (getNeighborPairs.py:77-83 style soft failures, all
observable in ``ClusterSelection``): per-(i,j)-species j-cluster counts
(``max_jcount`` vs ``plan.jcaps``), mirror occurrences (``max_mir`` vs
``plan.kmir``), and the single-image geometric bound (``geom_violation``:
one image shift serves all cl^2 atom pairs of a cluster pair only while
2*max_half_extent + reach < box/2 per axis).

Limitations: requires an orthorhombic-leaning box and a box comfortably
larger than 2*(2*cluster_extent + cutoff) — the planner rejects anything
else and the dense window path stays the general default.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import box_transform
from ..ops.pallas_window import FAR

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ClusterPlan:
    """Static cluster-mode plan (host-side, hashable)."""
    present: Tuple[int, ...]                 # species ids
    n_sp: Tuple[int, ...]                    # atoms per present species
    cl: int                                  # atoms per cluster
    col_grid: Tuple[Tuple[int, int], ...]    # (ncx, ncy) per species
    ncl: Tuple[int, ...]                     # clusters per species (ib pad)
    jcaps: Tuple[Tuple[int, ...], ...]       # [I][J] j-cluster capacities
    #                                          (exact min-pair-distance)
    cand_caps: Tuple[Tuple[int, ...], ...]   # [I][J] stage-1 box-test caps
    kmir: int                                # mirror occurrence capacity
    reach: float                             # cutoff + skin the plan holds

    @property
    def gid_base(self) -> Tuple[int, ...]:
        return tuple(int(x) for x in np.cumsum((0,) + self.ncl)[:-1])

    @property
    def ncl_total(self) -> int:
        return int(sum(self.ncl))

    @property
    def slot_base(self) -> Tuple[int, ...]:
        return tuple(int(x) * self.cl
                     for x in np.cumsum((0,) + self.ncl)[:-1])

    @property
    def n_slots(self) -> int:
        return self.ncl_total * self.cl

    @property
    def ktot(self) -> Tuple[int, ...]:
        return tuple(int(sum(j)) for j in self.jcaps)

    @property
    def n_entries(self) -> int:
        return int(sum(self.ncl[i] * self.ktot[i]
                       for i in range(len(self.ncl))))


class ClusterSelection(NamedTuple):
    """Frozen cluster selection (refresh-scoped)."""
    wrap_shift: Array            # [N, 3] frozen box wrap per atom
    slot_of_atom: Array          # [N] global slot id
    jlists: Tuple[Array, ...]    # per I: [ncl_I, ktot_I] global j-gids
    jmasks: Tuple[Array, ...]    # per I: [ncl_I, ktot_I]
    shifts: Tuple[Array, ...]    # per I: [3, ncl_I, ktot_I] image shifts
    mirror: Array                # [ncl_total, kmir] flat fwd-entry ids
    mirror_mask: Array           # [ncl_total, kmir]
    max_jcount: Array            # [S, S] true max j-cluster counts
    max_cand: Array              # [S, S] true max stage-1 box-test counts
    max_mir: Array               # scalar true max mirror occurrences
    geom_violation: Array        # bool: a cluster pair could wrap twice

    def did_overflow(self, plan: ClusterPlan) -> Array:
        jc = jnp.any(self.max_jcount > jnp.asarray(plan.jcaps))
        # Stage-1 truncation drops candidates BEFORE the exact stage, so
        # max_jcount alone cannot see it — check the pre-truncation counts
        # against cand_caps too.
        cand = jnp.any(self.max_cand > jnp.asarray(plan.cand_caps))
        mir = self.max_mir > plan.kmir
        return jc | cand | mir | self.geom_violation


def _round_up(x: int, m: int) -> int:
    return -(-int(x) // m) * m


@functools.lru_cache(maxsize=64)
def _column_layout(n_s: int, ncx: int, ncy: int, cl: int):
    """Static rank-space layout of equal-count quantile columns.

    Returns (slab_of_xrank [n_s], col_of_r2 [n_s], slot_of_r3 [n_s],
    n_slots): the x-slab of each x-rank, the column of each
    (slab, y)-sorted rank, the cluster slot of each (col, z)-sorted rank,
    and the species' slot-space size (clusters per column =
    ceil(count/cl), last cluster of a column padded).
    """
    slab_bounds = np.array([s * n_s // ncx for s in range(ncx + 1)])
    slab_of_xrank = np.repeat(np.arange(ncx, dtype=np.int32),
                              np.diff(slab_bounds))
    col_of_r2 = np.empty(n_s, np.int32)
    cnt = []
    cid = 0
    for s in range(ncx):
        m = int(slab_bounds[s + 1] - slab_bounds[s])
        for k in range(ncy):
            a0 = int(slab_bounds[s]) + k * m // ncy
            a1 = int(slab_bounds[s]) + (k + 1) * m // ncy
            col_of_r2[a0:a1] = cid
            cnt.append(a1 - a0)
            cid += 1
    cnt = np.asarray(cnt)
    nclus = -(-cnt // cl)
    slot_base = np.concatenate([[0], np.cumsum(nclus * cl)])
    col_start = np.concatenate([[0], np.cumsum(cnt)])
    slot_of_r3 = (np.arange(n_s)
                  + (slot_base[:-1] - col_start[:-1])[col_of_r2])
    return (slab_of_xrank, col_of_r2, slot_of_r3.astype(np.int32),
            int(slot_base[-1]))


def _pack_species_np(frac_s: np.ndarray, ncx: int, ncy: int, cl: int):
    """Planner-side replica of the device packing: returns (order [n_s]
    into the species block, slot_of_ordered [n_s], n_slots)."""
    n_s = len(frac_s)
    slab_of_xrank, col_of_r2, slot_of_r3, n_slots = _column_layout(
        n_s, ncx, ncy, cl)
    o1 = np.argsort(frac_s[:, 0], kind='stable')
    key2 = slab_of_xrank * 2.0 + frac_s[o1, 1]
    o2 = o1[np.argsort(key2, kind='stable')]
    key3 = col_of_r2 * 2.0 + frac_s[o2, 2]
    o3 = o2[np.argsort(key3, kind='stable')]
    return o3, slot_of_r3, n_slots


def _cluster_geometry_np(q: np.ndarray, slots: np.ndarray, n_slots: int,
                         cl: int):
    """Centroids/half-extents per cluster from wrapped positions (numpy)."""
    ncl_s = n_slots // cl
    qs = np.full((n_slots, 3), FAR)
    qs[slots] = q
    tiles = qs.reshape(ncl_s, cl, 3)
    vmask = tiles[:, :, 0] < FAR * 0.5
    lo = np.where(vmask[..., None], tiles, FAR).min(1)
    hi = np.where(vmask[..., None], tiles, -FAR).max(1)
    valid = vmask.any(1)
    cent = np.where(valid[:, None], (lo + hi) / 2, FAR)
    half = np.where(valid[:, None], (hi - lo) / 2, 0.0)
    return cent, half, valid


def plan_clusters(positions, box, species, cutoff: float, skin: float = 0.0,
                  margin: float = 1.15, cl: int = 8,
                  ib_block: int = 8) -> Optional[ClusterPlan]:
    """Host-side planner: cluster layout + capacities from this
    configuration (same observed-max-times-margin contract as
    ``plan_window_cells``). Returns None when the box is unsuitable
    (strongly triclinic, or too small for the single-image shift bound)."""
    box_np = np.asarray(box, np.float64) if box is not None else None
    if box_np is None or box_np.shape != (3, 3):
        return None
    diag = np.diag(box_np)
    off = np.abs(box_np - np.diag(diag)).max()
    if off > 0.05 * diag.min() or (diag < 2 * (cutoff + skin)).any():
        return None
    R = float(cutoff + skin)
    positions = np.asarray(positions, np.float64)
    species = np.asarray(species)
    present = tuple(int(s) for s in np.unique(species))
    inv = np.linalg.inv(box_np)
    frac = positions @ inv
    frac -= np.floor(frac)
    pos_w = frac @ box_np
    vol = float(abs(np.linalg.det(box_np)))

    n_sp, col_grid, ncl = [], [], []
    cents, halves, valids, tiles_sp = [], [], [], []
    for s in present:
        idx = np.where(species == s)[0]
        n_s = len(idx)
        dens = n_s / vol
        side = (cl / max(dens, 1e-12)) ** (1.0 / 3.0)
        ncx = max(1, int(round(diag[0] / side)))
        ncy = max(1, int(round(diag[1] / side)))
        order, slots, n_slots = _pack_species_np(frac[idx], ncx, ncy, cl)
        ncl_s = _round_up(n_slots // cl, ib_block)
        cent, half, valid = _cluster_geometry_np(
            pos_w[idx[order]], slots, ncl_s * cl, cl)
        qs = np.full((ncl_s * cl, 3), FAR)
        qs[slots] = pos_w[idx[order]]
        tiles_sp.append(qs.reshape(ncl_s, cl, 3))
        n_sp.append(n_s)
        col_grid.append((ncx, ncy))
        ncl.append(ncl_s)
        cents.append(cent)
        halves.append(half)
        valids.append(valid)

    # Geometric validity: ONE image shift serves all cl^2 atom pairs of a
    # cluster pair only while 2*max_half + R < box/2 per axis (otherwise a
    # beyond-cutoff pair can alias into the cutoff through the opposite
    # face). Enforced here with drift headroom and re-checked every
    # refresh (ClusterSelection.geom_violation).
    max_half = np.max([h.max(0) for h in halves], axis=0)
    if ((2 * max_half * 1.2 + R) >= diag / 2).any():
        return None

    # Two-stage capacities: stage 1 is the cluster-level box-box test
    # (cheap, conservative), stage 2 refines by EXACT min atom-pair
    # distance (the box hull over-includes ~40% at water density — caps
    # from exact counts keep the kernel's lanes ~2x tighter).
    jcaps, cand_caps = [], []
    occur = [np.zeros(n, np.int64) for n in ncl]
    for i in range(len(present)):
        caps_i, ccaps_i = [], []
        ti = tiles_sp[i]
        for j in range(len(present)):
            dc = cents[j][None, :, :] - cents[i][:, None, :]
            dc -= np.round(dc / diag) * diag
            gap = np.maximum(np.abs(dc)
                             - (halves[i][:, None, :] + halves[j][None]),
                             0.0)
            ok = (((gap ** 2).sum(-1) < R * R)
                  & valids[i][:, None] & valids[j][None, :])
            ccaps_i.append(int(np.ceil(ok.sum(1).max() * margin)) + 1)
            # Exact refinement (chunked over i-clusters).
            tj = tiles_sp[j]
            exact = np.zeros_like(ok)
            for a0 in range(0, len(ti), 128):
                a1 = min(a0 + 128, len(ti))
                for b0 in range(0, len(tj), 512):
                    b1 = min(b0 + 512, len(tj))
                    sub = ok[a0:a1, b0:b1]
                    if not sub.any():
                        continue
                    d = (ti[a0:a1, None, :, None, :]
                         - tj[None, b0:b1, None, :, :])
                    d -= np.round(d / diag) * diag
                    mind2 = (d ** 2).sum(-1).min((2, 3))
                    exact[a0:a1, b0:b1] = sub & (mind2 < R * R)
            cnt = exact.sum(1)
            cap = int(np.ceil(cnt.max() * margin)) + 1
            if i == j:
                cap = max(cap, 2)
            caps_i.append(cap)
            occur[j] += exact.sum(0)
        jcaps.append(caps_i)
        cand_caps.append(ccaps_i)
    # Lane alignment: EVERY per-(I,J) lane block must start and end on a
    # 128-lane boundary (jcap * cl multiples of 128) — the kernel's
    # per-species reductions are lane slices, and misaligned slice
    # extraction costs ~3x the whole kernel (measured 2.78 -> 0.95 ms for
    # the 26k H call just by rounding caps to 16-cluster multiples).
    mult = max(1, 128 // cl)
    for i in range(len(present)):
        jcaps[i] = [_round_up(c, mult) for c in jcaps[i]]
        # Stage 2's lanes (jcaps, lane-rounded) must never exceed what
        # stage 1 can supply — clamp the candidate caps up so the
        # select-time pad is dead-code insurance, not a live truncation.
        cand_caps[i] = [max(cc, jc) for cc, jc in zip(cand_caps[i],
                                                      jcaps[i])]
    kmir = int(np.ceil(max(int(o.max()) for o in occur) * margin)) + 1
    return ClusterPlan(present=present, n_sp=tuple(n_sp), cl=cl,
                       col_grid=tuple(col_grid),
                       ncl=tuple(int(x) for x in ncl),
                       jcaps=tuple(tuple(int(c) for c in j) for j in jcaps),
                       cand_caps=tuple(tuple(int(c) for c in j)
                                       for j in cand_caps),
                       kmir=kmir, reach=R)


def _segment_ranks(keys_sorted):
    """Rank of each sorted element within its equal-key segment."""
    n = keys_sorted.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), keys_sorted[1:] != keys_sorted[:-1]])
    seg0 = jax.lax.associative_scan(jnp.maximum,
                                    jnp.where(is_start, iota, 0))
    return iota - seg0


def _min_image_shift(delta: Array, box: Array) -> Array:
    """Accumulated image shift following the _part_deltas rounding order;
    returns the vector to SUBTRACT from the j side (min-imaged delta =
    delta - shift)."""
    dy = delta[..., 1]
    dz = delta[..., 2]
    s3 = jnp.round(dz / box[2, 2])
    dy = dy - s3 * box[2, 1]
    s2 = jnp.round(dy / box[1, 1])
    dx = delta[..., 0] - s3 * box[2, 0] - s2 * box[1, 0]
    s1 = jnp.round(dx / box[0, 0])
    return (s3[..., None] * box[2] + s2[..., None] * box[1]
            + s1[..., None] * box[0])


def select_clusters(positions: Array, box: Array, species: np.ndarray,
                    plan: ClusterPlan, cutoff: float,
                    skin: float = 0.0) -> ClusterSelection:
    """Freeze a cluster selection: quantile-column slot assignment, box-box
    j-lists, per-pair image shifts, and the mirror for the gather adjoint.
    ``cutoff + skin`` must match what ``plan_clusters`` was sized for."""
    del cutoff, skin  # the plan's reach is authoritative
    positions = jax.lax.stop_gradient(positions)
    box = jax.lax.stop_gradient(box)
    n = positions.shape[0]
    cl = plan.cl
    npres = len(plan.present)
    R = plan.reach
    species = np.asarray(species, np.int32)
    inv = jnp.linalg.inv(box)
    frac = box_transform(positions, inv)
    wrap_f = jnp.floor(frac)
    wrap_shift = box_transform(wrap_f, box)
    p_w = positions - wrap_shift
    frac_in = frac - wrap_f

    n_slots = plan.n_slots
    slot_of_atom = jnp.full((n,), n_slots, jnp.int32)
    for i, s in enumerate(plan.present):
        idx = np.where(species == s)[0]                       # static
        if len(idx) != plan.n_sp[i]:
            raise ValueError('species counts do not match the cluster plan')
        ncx, ncy = plan.col_grid[i]
        slab_of_xrank, col_of_r2, slot_of_r3, _ = _column_layout(
            plan.n_sp[i], ncx, ncy, cl)
        fx = frac_in[idx, 0]
        fy = frac_in[idx, 1]
        fz = frac_in[idx, 2]
        ids = jnp.asarray(idx, jnp.int32)
        _, o1 = jax.lax.sort([fx, ids], num_keys=1)
        key2 = (jnp.asarray(slab_of_xrank).astype(jnp.float32) * 2.0
                + frac_in[o1, 1].astype(jnp.float32))
        _, o2 = jax.lax.sort([key2, o1], num_keys=1)
        key3 = (jnp.asarray(col_of_r2).astype(jnp.float32) * 2.0
                + frac_in[o2, 2].astype(jnp.float32))
        _, o3 = jax.lax.sort([key3, o2], num_keys=1)
        gslot = jnp.asarray(slot_of_r3) + plan.slot_base[i]
        slot_of_atom = slot_of_atom.at[o3].set(gslot, mode='drop')
        del fy, fz

    # Reference planes (refresh-time positions) -> centroids and extents.
    planes = jnp.full((n_slots + 1, 3), FAR, positions.dtype)
    planes = planes.at[slot_of_atom].set(p_w, mode='drop')
    tiles = planes[:n_slots].reshape(plan.ncl_total, cl, 3)
    valid_slot = tiles[:, :, 0] < FAR * 0.5                   # [ncl, cl]
    big = jnp.asarray(FAR, positions.dtype)
    lo = jnp.min(jnp.where(valid_slot[..., None], tiles, big), axis=1)
    hi = jnp.max(jnp.where(valid_slot[..., None], tiles, -big), axis=1)
    cvalid = jnp.any(valid_slot, axis=1)                      # [ncl]
    cent = jnp.where(cvalid[:, None], (lo + hi) * 0.5, big)
    half = jnp.where(cvalid[:, None], (hi - lo) * 0.5, 0.0)
    diag3 = jnp.stack([box[0, 0], box[1, 1], box[2, 2]])
    geom_violation = jnp.any(2.0 * jnp.max(half, axis=0) + R >= diag3 / 2)

    # j-lists per i-species, two stages: (1) cluster-level box-box test
    # compacted to cand_caps, (2) EXACT min atom-pair distance over the
    # candidates (the box hull over-includes ~40% at water density),
    # compacted to the final caps. j-species-major lane blocks; self
    # cluster pinned at slot 0 of the own-species block.
    gid_base = plan.gid_base
    centp = jnp.concatenate([cent, jnp.full((1, 3), FAR, cent.dtype)])
    tiles_pad_ref = jnp.concatenate(
        [tiles, jnp.full((1, cl, 3), FAR, tiles.dtype)])
    jlists, jmasks, shifts = [], [], []
    max_jcount = [[None] * npres for _ in range(npres)]
    max_cand = [[None] * npres for _ in range(npres)]
    for i in range(npres):
        ci = jax.lax.dynamic_slice_in_dim(cent, gid_base[i], plan.ncl[i])
        hi_i = jax.lax.dynamic_slice_in_dim(half, gid_base[i], plan.ncl[i])
        vi = jax.lax.dynamic_slice_in_dim(cvalid, gid_base[i], plan.ncl[i])
        ti = jax.lax.dynamic_slice_in_dim(tiles, gid_base[i], plan.ncl[i])
        blocks, bmasks = [], []
        for j in range(npres):
            cj = jax.lax.dynamic_slice_in_dim(cent, gid_base[j],
                                              plan.ncl[j])
            hj = jax.lax.dynamic_slice_in_dim(half, gid_base[j],
                                              plan.ncl[j])
            vj = jax.lax.dynamic_slice_in_dim(cvalid, gid_base[j],
                                              plan.ncl[j])
            dc = cj[None, :, :] - ci[:, None, :]
            dc = dc - jnp.round(dc / diag3) * diag3
            gap = jnp.maximum(jnp.abs(dc)
                              - (hi_i[:, None, :] + hj[None, :, :]), 0.0)
            ok = ((jnp.sum(gap * gap, -1) < R * R)
                  & vi[:, None] & vj[None, :])
            if i == j:
                eye = jnp.eye(plan.ncl[i], dtype=bool)
                ok = ok & ~eye
            # Stage 1: compact box-test passes to cand_caps. Record the
            # TRUE pre-truncation count: truncation here drops candidates
            # before the exact stage, invisibly to max_jcount.
            max_cand[i][j] = jnp.max(jnp.sum(ok, 1))
            ccap = plan.cand_caps[i][j]
            bigk = jnp.int32(plan.ncl[j])
            lid = jnp.broadcast_to(
                jnp.arange(plan.ncl[j], dtype=jnp.int32)[None, :],
                ok.shape)
            top1 = jax.lax.sort(jnp.where(ok, lid, bigk),
                                dimension=1)[:, :ccap]
            m1 = top1 < bigk
            gid1 = jnp.where(m1, top1 + gid_base[j], plan.ncl_total)
            # Stage 2: exact min atom-pair distance on the candidates.
            tj = tiles_pad_ref[gid1]                   # [ncl_i, ccap, cl, 3]
            sh1 = _min_image_shift(centp[gid1] - ci[:, None, :], box)
            tjs = tj - sh1[:, :, None, :]
            d = ti[:, None, :, None, :] - tjs[:, :, None, :, :]
            mind2 = jnp.min(jnp.sum(d * d, -1), axis=(2, 3))
            exact = m1 & (mind2 < R * R)
            max_jcount[i][j] = (jnp.max(jnp.sum(exact, 1))
                                + (1 if i == j else 0))
            cap = plan.jcaps[i][j] - (1 if i == j else 0)
            big2 = jnp.int32(plan.ncl[j] + 1)
            top = jax.lax.sort(jnp.where(exact, top1, big2),
                               dimension=1)[:, :cap]
            if top.shape[1] < cap:
                # jcap can exceed the candidate column count (the planner
                # sizes caps from exact counts * margin, the candidate list
                # from box-box tests); pad so every block is exactly cap
                # wide and flat entry counts match plan.n_entries.
                top = jnp.concatenate([
                    top, jnp.full((top.shape[0], cap - top.shape[1]),
                                  big2, top.dtype)], axis=1)
            m = top < big2
            blk = jnp.where(m, top, plan.ncl_total - gid_base[j]) \
                + gid_base[j]
            if i == j:
                self_ids = (jnp.arange(plan.ncl[i], dtype=jnp.int32)
                            + gid_base[i])[:, None]
                blk = jnp.concatenate([self_ids, blk], axis=1)
                m = jnp.concatenate(
                    [jnp.ones((plan.ncl[i], 1), bool), m], axis=1)
            blocks.append(blk)
            bmasks.append(m)
        jl = jnp.concatenate(blocks, axis=1)         # [ncl_i, ktot_i]
        jm = jnp.concatenate(bmasks, axis=1)
        # Per-entry image shift from centroid deltas (clusters are compact,
        # << box/2 under the geometric bound, so one shift per cluster pair
        # is exact for all cl^2 atom pairs); zero on masked entries so
        # dummy lanes stay FAR.
        cj_g = centp[jnp.minimum(jl, plan.ncl_total)]
        sh = _min_image_shift(cj_g - ci[:, None, :], box)
        sh = jnp.where(jm[..., None], sh, 0.0)
        jlists.append(jl)
        jmasks.append(jm)
        shifts.append(sh.transpose(2, 0, 1))         # [3, ncl_i, ktot_i]
    max_jcount = jnp.stack([jnp.stack(r) for r in max_jcount])
    max_cand = jnp.stack([jnp.stack(r) for r in max_cand])

    # Mirror: for every j-cluster, the flat forward-entry positions that
    # reference it (the gather adjoint then sums kmir gathered tiles
    # instead of scatter-adding).
    e_total = plan.n_entries
    jg, valid = [], []
    for i in range(npres):
        jg.append(jlists[i].reshape(-1))
        valid.append(jmasks[i].reshape(-1))
    jg = jnp.concatenate(jg)
    valid = jnp.concatenate(valid)
    flat = jnp.arange(e_total, dtype=jnp.int32)
    bigj = jnp.int32(plan.ncl_total + 1)
    jkey = jnp.where(valid, jg, bigj)
    jk_s, flat_s = jax.lax.sort([jkey, flat], num_keys=1)
    ranks = _segment_ranks(jk_s)
    max_mir = jnp.max(jnp.where(jk_s < bigj, ranks, -1)) + 1
    pos_ok = (ranks < plan.kmir) & (jk_s < bigj)
    dest = jnp.where(pos_ok, jk_s * plan.kmir + ranks,
                     plan.ncl_total * plan.kmir)
    mirror = jnp.full((plan.ncl_total * plan.kmir,), e_total, jnp.int32)
    mirror = mirror.at[dest].set(flat_s, mode='drop')
    mirror = mirror.reshape(plan.ncl_total, plan.kmir)
    mirror_mask = mirror < e_total

    return ClusterSelection(
        wrap_shift=wrap_shift, slot_of_atom=slot_of_atom,
        jlists=tuple(jlists), jmasks=tuple(jmasks), shifts=tuple(shifts),
        mirror=mirror, mirror_mask=mirror_mask,
        max_jcount=max_jcount, max_cand=max_cand, max_mir=max_mir,
        geom_violation=geom_violation)


@jax.custom_vjp
def _gather_j(tiles, jidx_cat, shifts_cat, mirror, mirror_mask):
    """Cluster-granular j-plane gather with a frozen mirror adjoint.

    ``tiles``: [ncl_total + 1, cl, 3] cluster atom tiles (pad row FAR);
    ``jidx_cat``: [E] concatenated clamped j-gids; ``shifts_cat``: [E, 3].
    Returns [E, cl, 3] shifted j tiles. The VJP gathers each j-cluster's
    (at most kmir) forward-entry cotangent tiles via the frozen mirror and
    sums them -- no XLA scatter-add anywhere.
    """
    t = tiles[jidx_cat]                                # [E, cl, 3]
    return t - shifts_cat[:, None, :]


def _gather_j_fwd(tiles, jidx_cat, shifts_cat, mirror, mirror_mask):
    out = _gather_j(tiles, jidx_cat, shifts_cat, mirror, mirror_mask)
    return out, (mirror, mirror_mask, tiles.shape[0])


def _gather_j_bwd(res, g):
    mirror, mirror_mask, n_tiles = res
    e, cl, _ = g.shape
    g_flat = jnp.concatenate(
        [g.reshape(e, cl * 3),
         jnp.zeros((1, cl * 3), g.dtype)], axis=0)
    gm = g_flat[mirror.reshape(-1)].reshape(
        mirror.shape[0], mirror.shape[1], cl, 3)
    gm = jnp.where(mirror_mask[..., None, None], gm, 0.0)
    d_tiles = jnp.sum(gm, axis=1)                      # [ncl_total, cl, 3]
    d_tiles = jnp.concatenate(
        [d_tiles, jnp.zeros((n_tiles - d_tiles.shape[0], cl, 3), g.dtype)])
    return (d_tiles, None, None, None, None)


_gather_j.defvjp(_gather_j_fwd, _gather_j_bwd)


def cluster_radial_features(positions: Array,
                            sel: ClusterSelection, plan: ClusterPlan,
                            basis, row_atom: Array,
                            interpret: Optional[bool] = None) -> Array:
    """Per-atom radial AEV rows [len(row_atom), P*R] via the cluster-pair
    kernel, differentiable in ``positions``. ``row_atom``: atom index per
    output row. Output column p*R+q = unnormalized radial function q
    against present-species p (same layout as the window radial)."""
    from ..ops.pallas_cluster import cluster_radial_aev
    cl = plan.cl
    npres = len(plan.present)
    n_slots = plan.n_slots
    p_w = positions - sel.wrap_shift
    planes = jnp.full((n_slots + 1, 3), FAR, positions.dtype)
    planes = planes.at[sel.slot_of_atom].set(p_w, mode='drop')
    tiles = planes[:n_slots].reshape(plan.ncl_total, cl, 3)
    tiles_pad = jnp.concatenate(
        [tiles, jnp.full((1, cl, 3), FAR, tiles.dtype)])

    jidx_cat = jnp.concatenate(
        [jnp.minimum(jl, plan.ncl_total).reshape(-1) for jl in sel.jlists])
    shifts_cat = jnp.concatenate(
        [sh.transpose(1, 2, 0).reshape(-1, 3) for sh in sel.shifts])
    jt = _gather_j(tiles_pad, jidx_cat, shifts_cat, sel.mirror,
                   sel.mirror_mask)                    # [E, cl, 3]

    gid_base = plan.gid_base
    out_blocks = []
    off = 0
    for i in range(npres):
        ncl_i, ktot_i = plan.ncl[i], plan.ktot[i]
        e_i = ncl_i * ktot_i
        block = jax.lax.dynamic_slice_in_dim(jt, off, e_i)
        off += e_i
        lanes = block.reshape(ncl_i, ktot_i * cl, 3)
        jx = lanes[:, :, 0]
        jy = lanes[:, :, 1]
        jz = lanes[:, :, 2]
        centers = jax.lax.dynamic_slice_in_dim(tiles, gid_base[i], ncl_i)
        rad = cluster_radial_aev(
            jx, jy, jz, centers, basis.radial_cutoff, basis.radial_eta,
            basis.radial_rs, cl, plan.jcaps[i], i, basis.torchani,
            interpret=interpret)                       # [ncl_i, cl, P*R]
        out_blocks.append(rad)
    rad_slots = jnp.concatenate(out_blocks, axis=0).reshape(
        n_slots, -1)                                   # [n_slots, P*R]
    row_slots = jnp.minimum(sel.slot_of_atom[row_atom], n_slots - 1)
    return rad_slots[row_slots]
