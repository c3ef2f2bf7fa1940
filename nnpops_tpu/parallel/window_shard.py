"""SPMD sharding of the PRODUCTION window pipeline (shard_map over a mesh).

The reference has no distributed execution at all (SURVEY §2.3); this is
the framework's designed multi-chip story for the window AEV path — the
same kernels that run the single-chip 26k-atom workload, with the heavy
stages split over a device mesh:

* RADIAL: the per-cell window Pallas kernel runs on a contiguous CELL
  block per device (the grid axis of ``ops.pallas_window``), after a
  replicated (cheap, bandwidth-only) slot build; the per-slot radial AEV
  blocks are ``all_gather``-ed so every device can read its atoms' rows.
* ANGULAR + NN: tier rows are split per SEGMENT (each species' big and
  small row ranges are divided equally across devices), so every device's
  row block has a static species layout and the per-species atomic
  networks run on static row slices, exactly like the single-device path.
* Forces: positions enter replicated; the total energy is a ``psum``, so
  ``jax.grad`` produces the correct summed force without any hand-written
  cross-device reduction (the shard_map transpose inserts it).

Two deliberate deviations from the single-device fast path (correctness
identical, noted for perf work):

* the angular payload gather uses the PLAIN gather whose AD transpose is a
  local scatter-add — the frozen mirror-gather adjoint pairs entries
  ACROSS rows, which a row-sharded cotangent cannot see;
* cell-occupancy bucketing is skipped (its frozen cell permutation does
  not commute with contiguous cell blocks); all cells run at full caps.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.ani import ANIModel, ANIParams
from ..neighbors.window import (WindowSelection, _make_stencil_window,
                                _part_deltas)
from ..neighbors.blocked import BlockedLayout
from ..ops.pallas_aev import angular_aev_pallas
from ..ops.pallas_window import FAR, window_radial_aev
from ..ops.batched_nn import apply_species_net

Array = jnp.ndarray


def _ceil_to(x: int, m: int) -> int:
    return -(-int(x) // m) * m


def window_sharded_energy(model: ANIModel, mesh: Mesh, axis: str = 'dp'):
    """Build ``fn(params, positions, box, sel) -> energy`` sharding the
    window pipeline over ``mesh[axis]`` (positions replicated, energy
    psum-reduced; differentiable — forces via ``jax.grad``).

    ``model`` must be window-mode (``with_blocked_layout(impl='window')``)
    and ``sel`` a :class:`WindowSelection` from ``model.select``.
    """
    if model.aev_impl != 'window':
        raise ValueError('window_sharded_energy needs a window-mode model')
    layout: BlockedLayout = model.blocked_layout
    basis = model.basis
    dsz = int(mesh.shape[axis])
    cell_caps = tuple(int(x) for x in layout.cell_caps)
    c = sum(cell_caps)
    cell_grid = tuple(int(x) for x in layout.cell_grid)
    ncells = int(np.prod(cell_grid))
    cc = ncells * c
    num_r = basis.num_radial
    npres = len(layout.present)
    offs = np.cumsum((0,) + cell_caps)[:-1]
    # Padded cell-block size per device (tail block padded with FAR slots —
    # those rows produce exact zeros).
    nc_b = _ceil_to(ncells, dsz) // dsz

    # Angular-grid slot count (the tier indices live in this slot space).
    if layout.ang_cell_grid is not None and layout.ang_cell_caps is not None:
        cc_a = int(np.prod(layout.ang_cell_grid)) * sum(layout.ang_cell_caps)
    else:
        cc_a = cc

    # Static tier segmentation: per tier, [tier rows of species 0 .. P-1]
    # row ranges, each split into dsz equal (padded) sub-blocks.
    g = model.grouping
    present_counts = tuple(int(g.counts[s]) for s in layout.present)
    if layout.ang_tier_rows is None:
        raise ValueError('window_sharded_energy requires angular tiering '
                         '(layout.ang_tier_rows); plan with '
                         'with_blocked_layout(impl="window")')
    from ..neighbors.window import _tier_rows_static, tier_layouts
    tier_rows = _tier_rows_static(present_counts, layout.ang_tier_rows)
    ntiers = len(tier_rows)
    tier_starts = [np.cumsum((0,) + tuple(tr))[:-1] for tr in tier_rows]
    tier_sub = [tuple(_ceil_to(r, dsz) // dsz for r in tr)
                for tr in tier_rows]
    # Species-block-relative row offset of tier t inside row_atom's
    # species-major / tier-sorted order.
    cum_rows = np.zeros((ntiers + 1, npres), np.int64)
    for t in range(ntiers):
        cum_rows[t + 1] = cum_rows[t] + np.asarray(tier_rows[t])
    tier_lays = tier_layouts(layout)
    species_np = model.species_array

    def _slice_seg(x, start: int, count: int, sub: int, d, fill):
        """Device d's padded sub-block of rows [start, start+count)."""
        padded = jnp.full((sub * dsz,) + x.shape[1:], fill, x.dtype)
        padded = jax.lax.dynamic_update_slice_in_dim(
            padded, jax.lax.slice_in_dim(x, start, start + count, axis=0),
            0, axis=0)
        return jax.lax.dynamic_slice_in_dim(padded, d * sub, sub, axis=0)

    def _gather_rows(t, d, fill_idx):
        """Per-device tier rows: (idx, mask, slot_rows) per tier, padded
        per segment so the species layout is static."""
        outs = []
        for ti in range(ntiers):
            idx, mask, srows = t.idx[ti], t.mask[ti], t.slot_rows[ti]
            starts, counts, subs = (tier_starts[ti], tier_rows[ti],
                                    tier_sub[ti])
            pi, pm, ps = [], [], []
            for i in range(npres):
                pi.append(_slice_seg(idx, int(starts[i]), counts[i],
                                     subs[i], d, fill_idx))
                pm.append(_slice_seg(mask, int(starts[i]), counts[i],
                                     subs[i], d, False))
                ps.append(_slice_seg(srows, int(starts[i]), counts[i],
                                     subs[i], d, fill_idx))
            outs.append((jnp.concatenate(pi), jnp.concatenate(pm),
                         jnp.concatenate(ps)))
        return outs

    def _species_energy(params: ANIParams, feat, srows_species_layout,
                        mask_rows):
        """Per-species NN energy over a static species-blocked row layout
        [(count per species)], masked rows contribute zero."""
        total = jnp.zeros((), feat.dtype)
        off = 0
        for i, cnt in enumerate(srows_species_layout):
            f = jax.lax.slice_in_dim(feat, off, off + cnt, axis=0)
            m = jax.lax.slice_in_dim(mask_rows, off, off + cnt, axis=0)
            net = params.ensemble.networks[layout.present[i]]
            e_i = jnp.mean(apply_species_net(net, f), axis=-1)   # [cnt]
            total = total + jnp.sum(jnp.where(m, e_i, 0.0))
            off += cnt
        return total

    def _block_energy(params: ANIParams, positions: Array, box: Array,
                      sel: WindowSelection):
        d = jax.lax.axis_index(axis)
        t = sel.tier

        # ---- Radial: replicated slot build, sharded window kernel.
        p_w = positions - sel.wrap_shift
        pos_sorted = p_w[sel.rad_order]
        slots = jnp.full((cc, 3), FAR, positions.dtype)
        slots = slots.at[sel.rad_slot_of_sorted].set(pos_sorted, mode='drop')
        planes = slots.T.reshape(3, ncells, c)
        wins = []
        for i, cs in enumerate(cell_caps):
            sub = planes[:, :, int(offs[i]):int(offs[i]) + cs]
            wins.append(_make_stencil_window(cell_grid, cs)(sub))
        win = jnp.concatenate(wins, axis=2) + sel.shift_planes
        centers = slots.reshape(ncells, c, 3)
        # Device cell block (tail-padded with FAR: padded cells produce
        # exact-zero radial rows — FAR centers fail every cutoff test).
        padn = nc_b * dsz - ncells
        if padn:
            win = jnp.concatenate(
                [win, jnp.full((3, padn, win.shape[2]), FAR, win.dtype)],
                axis=1)
            centers = jnp.concatenate(
                [centers, jnp.full((padn, c, 3), FAR, centers.dtype)],
                axis=0)
        win_b = jax.lax.dynamic_slice_in_dim(win, d * nc_b, nc_b, axis=1)
        ctr_b = jax.lax.dynamic_slice_in_dim(centers, d * nc_b, nc_b, axis=0)
        rad_b = window_radial_aev(
            win_b[0], win_b[1], win_b[2], ctr_b,
            basis.radial_cutoff, basis.radial_eta, basis.radial_rs,
            cell_caps, basis.torchani)                  # [nc_b, c, P*R]
        rad_all = jax.lax.all_gather(rad_b, axis, axis=0, tiled=True)
        rad_flat = rad_all.reshape(nc_b * dsz * c, npres * num_r)

        # ---- Angular: per-device tier row blocks, plain-gather payload.
        pos_sorted_a = positions[sel.ang.order]
        slots_a = jnp.zeros((cc_a + 2, 3), positions.dtype)
        slots_a = slots_a.at[sel.ang.slot_of_sorted].set(pos_sorted_a,
                                                         mode='drop')
        tiers_d = _gather_rows(t, d, cc_a + 1)
        # Tier row order is [per species: tier-0 rows | tier-1 | ...];
        # row_atom follows that order, so species i's tier-ti rows start
        # at off_all[i] + cum_rows[ti][i].
        off_all = np.cumsum((0,) + present_counts)[:-1]
        tier_atoms = []
        for ti in range(ntiers):
            parts = [_slice_seg(t.row_atom,
                                int(off_all[i] + cum_rows[ti][i]),
                                tier_rows[ti][i], tier_sub[ti][i], d, 0)
                     for i in range(npres)]
            tier_atoms.append(jnp.concatenate(parts))

        def ang_block(idx, mask, srows, lay):
            out3 = slots_a[idx.reshape(-1)].reshape(
                idx.shape[0], idx.shape[1], 3).transpose(2, 0, 1)
            ctrs = slots_a[jnp.minimum(srows, cc_a + 1)]
            deltas = _part_deltas(out3, ctrs, mask, box)
            return angular_aev_pallas(deltas, mask, basis, lay,
                                      rad_width=deltas.shape[2])

        tier_ang = [ang_block(idx, mask, srows, tier_lays[ti])
                    for ti, (idx, mask, srows) in enumerate(tiers_d)]

        # ---- Full AEV rows + per-species NN on static layouts.
        def full_feat(ang_rows, atom_idx):
            row_slots = jnp.minimum(sel.rad_slot_of_atom[atom_idx], cc - 1)
            radial_rows = rad_flat[row_slots]
            pieces = []
            for s in range(basis.num_species):
                if s in layout.present:
                    i = layout.present.index(s)
                    pieces.append(radial_rows[:, i * num_r:(i + 1) * num_r])
                else:
                    pieces.append(jnp.zeros((radial_rows.shape[0], num_r),
                                            radial_rows.dtype))
            return jnp.concatenate(pieces + [ang_rows], axis=1)

        # Row validity: padded rows carry slot cc_a+1 (centers read the
        # zero pad row) — detect via the fill marker on slot_rows.
        total = jnp.zeros((), jnp.float32)
        for ti, (idx, mask, srows) in enumerate(tiers_d):
            mrow = srows < cc_a + 1
            total = total + _species_energy(
                params, full_feat(tier_ang[ti], tier_atoms[ti]),
                tier_sub[ti], mrow)
        # SAE once (device 0 only).
        sae = jnp.sum(params.self_energies[jnp.asarray(species_np)])
        total = total + jnp.where(d == 0, sae, 0.0)
        return jax.lax.psum(total, axis)

    def fn(params: ANIParams, positions: Array, box: Array,
           sel: WindowSelection) -> Array:
        shard_fn = functools.partial(_block_energy)
        # check_vma=False: the block energy runs Pallas kernels, whose
        # out_shape carries no varying-across-mesh annotation (JAX rejects
        # that combination under the default vma checking); the reduction
        # semantics are explicit here anyway (psum above).
        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P()), out_specs=P(),
            check_vma=False)(
                params, positions, box, sel)

    return fn
