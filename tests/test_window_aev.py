"""Window-mode AEV path (dense per-cell radial kernel + compacted angular):
parity against the blocked/pallas path, periodic-wrap invariance, and the
capacity-overflow contract."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.utils.water import make_water_box


@pytest.fixture(scope='module')
def setup():
    water = make_water_box(150, seed=0)       # box ~3 cells per axis
    basis = ANIBasis.ani2x()
    base = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
    window = base.with_blocked_layout(water.positions, water.box,
                                      impl='window')
    pallas = base.with_blocked_layout(water.positions, water.box,
                                      impl='pallas')
    assert window.aev_impl == 'window'        # box is big enough for cells
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    cl = window.create_cell_list(water.box)
    return water, window, pallas, params, cl


def test_window_energy_forces_match_pallas(setup):
    water, window, pallas, params, cl = setup
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    e1, f1 = pallas.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = window.energy_and_forces_fused(params, pos, box, cl)
    np.testing.assert_allclose(e2, e1, rtol=1e-5)
    scale = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(f2, f1, rtol=2e-4, atol=2e-5 * scale)


def test_window_wrap_invariance(setup):
    """Translating atoms by whole box vectors changes nothing (the frozen
    wrap_shift re-wraps into the primary box)."""
    water, window, pallas, params, cl = setup
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    rng = np.random.RandomState(3)
    shifts = rng.randint(-2, 3, (pos.shape[0], 3)).astype(np.float32)
    pos2 = pos + jnp.asarray(shifts) @ box
    e1, f1 = window.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = window.energy_and_forces_fused(params, pos2, box, cl)
    np.testing.assert_allclose(e2, e1, rtol=1e-6)
    # f32 rounding differs after subtracting box multiples; only noise-level
    # deviations are acceptable.
    scale = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(f2, f1, rtol=1e-3, atol=1e-4 * scale)


def test_window_sticky_selection_reuse(setup):
    """A frozen selection stays valid for drifted positions within the
    Verlet-skin contract (cell list built with cutoff + skin)."""
    water, window, pallas, params, _ = setup
    skin = 0.3
    window = ANIModel.from_atomic_numbers(
        water.atomic_numbers, window.basis).with_blocked_layout(
            water.positions, water.box, impl='window', skin=skin)
    cl = window.create_cell_list(water.box, skin=skin)
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    sel = window.select(pos, box, cl)
    rng = np.random.RandomState(5)
    drift = jnp.asarray(rng.uniform(-1, 1, pos.shape).astype(np.float32)
                        * (skin / 2 / np.sqrt(3)) * 0.9)
    pos2 = pos + drift
    e_frozen, f_frozen = window.energy_and_forces_from_selection(
        params, pos2, box, cl, sel)
    sel2 = window.select(pos2, box, cl)
    e_fresh, f_fresh = window.energy_and_forces_from_selection(
        params, pos2, box, cl, sel2)
    np.testing.assert_allclose(e_frozen, e_fresh, rtol=1e-5)
    scale = np.abs(np.asarray(f_fresh)).max()
    np.testing.assert_allclose(f_frozen, f_fresh, rtol=2e-4,
                               atol=2e-5 * scale)


def test_window_overflow_detected(setup):
    water, window, pallas, params, _ = setup
    # Shrink the planned per-(cell, species) capacities below the true
    # occupancy; the soft-failure contract must detect the overflow.
    small = dataclasses.replace(window.blocked_layout, cell_caps=(4, 4))
    tiny_model = dataclasses.replace(window, blocked_layout=small)
    tiny = tiny_model.create_cell_list(water.box)
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    with pytest.raises(RuntimeError, match='overflow'):
        tiny_model.check_overflow(pos, box, tiny)


def test_window_cell_bucketing_parity(setup):
    """Forcing the two-class (big/small occupancy) kernel split changes
    nothing: energies and forces match the single-call window path."""
    water, window, pallas, params, cl = setup
    small_caps = tuple(max(c - 4, 1)
                       for c in window.blocked_layout.cell_caps)
    bucketed_layout = dataclasses.replace(
        window.blocked_layout, small_caps=small_caps,
        num_big_cells=cl.num_cells - 8)    # leave some cells in each class
    # Bucketing applies to the directed 27-cell window kernel only.
    bucketed = dataclasses.replace(window, blocked_layout=bucketed_layout,
                                   window_radial='window')
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    # The forced capacities must actually hold (otherwise the soft-failure
    # contract fires and the comparison is meaningless).
    bucketed.check_overflow(pos, box, cl)
    e1, f1 = window.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = bucketed.energy_and_forces_fused(params, pos, box, cl)
    np.testing.assert_allclose(e2, e1, rtol=1e-6)
    scale = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(f2, f1, rtol=1e-5, atol=1e-6 * scale)


def test_window_three_tier_parity(setup):
    """Forcing a THREE-tier angular row ladder (full / mid / small caps)
    changes nothing: energies and forces match the pallas oracle. Tier
    caps/rows are built from brute-force angular neighbor counts so no
    planned capacity overflows."""
    water, window, pallas, params, cl = setup
    layout = window.blocked_layout
    if layout.ang_tier_caps is None:
        pytest.skip('tiering not planned for this box')
    pos_np = np.asarray(water.positions, np.float64)
    box_np = np.asarray(water.box, np.float64)
    n = len(pos_np)
    delta = pos_np[None] - pos_np[:, None]
    for ax in (2, 1, 0):
        delta -= np.round(delta[..., ax:ax + 1] / box_np[ax, ax]) * box_np[ax]
    d = np.sqrt((delta ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    ra = window.basis.angular_cutoff + 0.25          # setup skin = default
    sp = np.asarray(window.species_array)
    pres = layout.present
    counts = np.stack([(d[:, sp == pres[i]] < ra).sum(1)
                       for i in range(len(pres))], axis=1)
    caps = np.asarray(layout.ang_caps)
    mid = np.minimum(np.ceil(
        np.percentile(counts, 85, axis=0)).astype(int) + 1, caps - 1)
    small = np.minimum(np.ceil(
        np.percentile(counts, 50, axis=0)).astype(int) + 1, mid - 1)
    small = np.maximum(small, 1)
    mid = np.maximum(mid, small)
    fits_mid = (counts <= mid).all(1)
    fits_small = (counts <= small).all(1)
    t_of = fits_mid.astype(int) + fits_small.astype(int)
    rows = []
    cum = np.zeros(len(pres), np.int64)
    for t in (0, 1):
        r = np.array([max(int(((t_of == t) & (sp == pres[i])).sum()), 1) + 4
                      for i in range(len(pres))])
        r = np.minimum(r, np.array([(sp == pres[i]).sum()
                                    for i in range(len(pres))]) - cum - 1)
        r = np.maximum(r, 0)
        rows.append(tuple(int(x) for x in r))
        cum += r
    tiered_layout = dataclasses.replace(
        layout,
        ang_tier_caps=(tuple(int(x) for x in mid),
                       tuple(int(x) for x in small)),
        ang_tier_rows=tuple(rows))
    tiered = dataclasses.replace(window, blocked_layout=tiered_layout)
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    tiered.check_overflow(pos, box, cl)    # forced capacities must hold
    e1, f1 = pallas.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = tiered.energy_and_forces_fused(params, pos, box, cl)
    np.testing.assert_allclose(e2, e1, rtol=1e-5)
    scale = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(f2, f1, rtol=2e-4, atol=2e-5 * scale)


def test_window_requires_cells():
    water = make_water_box(8, seed=1)         # box far below 3 cells
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
    model = model.with_blocked_layout(water.positions, water.box,
                                      impl='window')
    assert model.aev_impl == 'pallas'         # automatic fallback


@pytest.mark.slow          # z-pair kernel is off by default
def test_pair_radial_matches_window_radial(setup):
    """The symmetric cell-pair radial kernel (ops.pallas_zpair) reproduces
    the directed 27-cell window kernel to f32 noise."""
    water, window, pallas, params, cl = setup
    paired = dataclasses.replace(window, window_radial='pair')
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    e1, f1 = window.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = paired.energy_and_forces_fused(params, pos, box, cl)
    np.testing.assert_allclose(e2, e1, rtol=1e-6)
    scale = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(f2, f1, rtol=1e-4, atol=2e-6 * scale)


@pytest.mark.slow          # wrap semantics also covered by
def test_window_wrapped_positions_match_pallas(setup):  # test_window_wrap_invariance
    """Atoms translated OUT of the primary box (so the frozen wrap_shift is
    nonzero) still match the min-image pallas path tightly.

    Regression test: the wrap/stencil image shifts were once computed with a
    default-precision (single-bf16-pass) matmul against the box vectors,
    displacing every wrapped atom by up to box * 2^-9 — ~0.03 A at a
    production box — and silently corrupting boundary forces."""
    water, window, pallas, params, cl = setup
    box = jnp.asarray(water.box)
    # A fractional translation pushes ~half the atoms across the boundary;
    # physics is translation invariant, and the pallas path wraps by exact
    # elementwise minimum-image rounding.
    pos = jnp.asarray(water.positions) - 0.37 * jnp.diag(box)[None, :]
    e1, f1 = pallas.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = window.energy_and_forces_fused(params, pos, box, cl)
    np.testing.assert_allclose(e2, e1, rtol=1e-5)
    scale = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(f2, f1, rtol=2e-4, atol=2e-5 * scale)


@pytest.mark.slow          # ~5 min interpret-mode; quick lane keeps
def test_window_triclinic_box_parity():   # the rectangular parity
    """The window fast path on a REDUCED TRICLINIC box matches the
    min-image pallas/blocked oracle (the reference supports triclinic in
    production everywhere: CpuANISymmetryFunctions.cpp:361-379,
    getNeighborPairsCPU.cpp:65-69). The whole window pipeline is built in
    fractional space, so the triclinic box rides the same code: this test
    pins that contract (VERDICT r2 item 4)."""
    from nnpops_tpu.utils.water import make_triclinic_water_box
    water = make_triclinic_water_box(300, seed=0)     # ~20.8 A, sheared
    basis = ANIBasis.ani2x()
    base = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
    window = base.with_blocked_layout(water.positions, water.box,
                                      impl='window')
    assert window.aev_impl == 'window', 'triclinic box must stay on the fast path'
    pallas = base.with_blocked_layout(water.positions, water.box,
                                      impl='pallas')
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    cl = window.create_cell_list(water.box)
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    e1, f1 = pallas.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = window.energy_and_forces_fused(params, pos, box, cl)
    np.testing.assert_allclose(e2, e1, rtol=1e-5)
    scale = np.abs(np.asarray(f1)).max()
    np.testing.assert_allclose(f2, f1, rtol=2e-4, atol=2e-5 * scale)


@pytest.mark.slow          # kernel-vs-sort impl A/B; every quick
def test_compact_kernel_matches_sort(setup):  # window test runs the kernel path
    """The Pallas rank left-pack compaction selects the same neighbor SETS
    and counts as the bitonic lane sorts (lane order differs: entry-major
    vs slot-ascending), and the energies/forces built on top agree."""
    from nnpops_tpu.neighbors.window import select_window
    water, window, pallas, params, cl = setup
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    g = window.grouping
    layout = window.blocked_layout
    kw = dict(species=window.species_array, layout=layout,
              radial_cutoff=window.basis.radial_cutoff,
              angular_cutoff=window.basis.angular_cutoff,
              grouping_order=np.asarray(g.order),
              present_counts=tuple(g.counts[s] for s in layout.present),
              need_shift_planes=True)
    s_k = select_window(cl, pos, box, compact_impl='kernel', **kw)
    s_s = select_window(cl, pos, box, compact_impl='sort', **kw)
    np.testing.assert_array_equal(np.asarray(s_k.ang.max_rad),
                                  np.asarray(s_s.ang.max_rad))
    # Same neighbor SET per (row, species block), kernel rows left-packed.
    offs = np.cumsum((0,) + layout.ang_caps)
    nk = np.asarray(s_k.ang.nbr_rad)
    ns = np.asarray(s_s.ang.nbr_rad)
    mk = np.asarray(s_k.ang.rad_mask)
    ms = np.asarray(s_s.ang.rad_mask)
    np.testing.assert_array_equal(mk.sum(1), ms.sum(1))
    for b in range(len(layout.ang_caps)):
        blk = slice(offs[b], offs[b + 1])
        np.testing.assert_array_equal(np.sort(nk[:, blk], axis=1),
                                      np.sort(ns[:, blk], axis=1))
    e1, f1 = window.energy_and_forces_from_selection(params, pos, box, cl,
                                                     s_k)
    e2, f2 = window.energy_and_forces_from_selection(params, pos, box, cl,
                                                     s_s)
    np.testing.assert_allclose(e1, e2, rtol=1e-6)
    scale = np.abs(np.asarray(f2)).max()
    np.testing.assert_allclose(f1, f2, rtol=1e-4, atol=1e-5 * scale)

@pytest.mark.slow          # 'mask' compaction is a non-default A/B
def test_compact_mask_matches_sort(setup):
    """The slot-space validity-mask compaction (one kernel over cells, no
    per-atom candidate gather) selects the same neighbor SETS and counts
    as the bitonic lane sorts, and energies/forces agree. Kept as an A/B
    variant: measured a perf WASH vs 'kernel' at 26k (NOTES_PERF r4)."""
    from nnpops_tpu.neighbors.window import select_window
    water, window, pallas, params, cl = setup
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    g = window.grouping
    layout = window.blocked_layout
    kw = dict(species=window.species_array, layout=layout,
              radial_cutoff=window.basis.radial_cutoff,
              angular_cutoff=window.basis.angular_cutoff,
              grouping_order=np.asarray(g.order),
              present_counts=tuple(g.counts[s] for s in layout.present),
              need_shift_planes=True)
    s_m = select_window(cl, pos, box, compact_impl='mask', **kw)
    s_s = select_window(cl, pos, box, compact_impl='sort', **kw)
    np.testing.assert_array_equal(np.asarray(s_m.ang.max_rad),
                                  np.asarray(s_s.ang.max_rad))
    offs = np.cumsum((0,) + layout.ang_caps)
    nm = np.asarray(s_m.ang.nbr_rad)
    ns = np.asarray(s_s.ang.nbr_rad)
    mm = np.asarray(s_m.ang.rad_mask)
    ms = np.asarray(s_s.ang.rad_mask)
    np.testing.assert_array_equal(mm.sum(1), ms.sum(1))
    # Masked lanes must carry the sentinel so sorted comparisons align.
    for b in range(len(layout.ang_caps)):
        blk = slice(offs[b], offs[b + 1])
        np.testing.assert_array_equal(np.sort(nm[:, blk], axis=1),
                                      np.sort(ns[:, blk], axis=1))
    e1, f1 = window.energy_and_forces_from_selection(params, pos, box, cl,
                                                     s_m)
    e2, f2 = window.energy_and_forces_from_selection(params, pos, box, cl,
                                                     s_s)
    np.testing.assert_allclose(e1, e2, rtol=1e-6)
    scale = np.abs(np.asarray(f2)).max()
    np.testing.assert_allclose(f1, f2, rtol=1e-4, atol=1e-5 * scale)


def test_mirror_packed_two_sort_matches_legacy(setup):
    """The relative-lane-encoded 2-sort mirror is bit-identical to the
    legacy slot-pair-key pairing (the mirror is uniquely determined: every
    directed entry has exactly one reverse)."""
    import nnpops_tpu.neighbors.window as W
    water, window, pallas, params, cl = setup
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    g = window.grouping
    layout = window.blocked_layout
    calls = []
    orig = W._mirror_packed

    def spy(segments, cc, grid3=None, c_per_cell=None):
        assert grid3 is not None and c_per_cell is not None
        new = orig(segments, cc, grid3=grid3, c_per_cell=c_per_cell)
        old = orig(segments, cc, grid3=None, c_per_cell=None)
        for a, b in zip(new, old):
            calls.append(bool((np.asarray(a) == np.asarray(b)).all()))
        return new

    W._mirror_packed = spy
    try:
        W.select_window(cl, pos, box, window.species_array, layout,
                        window.basis.radial_cutoff,
                        window.basis.angular_cutoff,
                        grouping_order=np.asarray(g.order),
                        present_counts=tuple(g.counts[s]
                                             for s in layout.present),
                        need_shift_planes=True)
    finally:
        W._mirror_packed = orig
    assert calls and all(calls)


def test_angular_kernel_rejects_unknown_impl():
    from nnpops_tpu.neighbors.blocked import BlockedLayout
    from nnpops_tpu.ops.pallas_aev import make_angular_kernel
    basis = ANIBasis.ani2x()
    lay = BlockedLayout(num_species=7, present=(0, 3), rad_caps=(8, 4),
                        ang_caps=(8, 4))
    with pytest.raises(ValueError, match='fc_impl'):
        make_angular_kernel(basis, lay, fc_impl='ploy')
    with pytest.raises(ValueError, match='bwd_impl'):
        make_angular_kernel(basis, lay, bwd_impl='v3')
