"""Species-blocked AEV path: parity vs the oracle compute_aev, layout
planning, frozen-selection reuse, and overflow observability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors.blocked import (BlockedLayout, build_blocked_payload,
                                          payload_from_blocked,
                                          plan_blocked_layout, select_blocked)
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.aev import compute_aev, dense_neighbor_list
from nnpops_tpu.ops.aev_blocked import build_triple_tables, compute_aev_blocked
from nnpops_tpu.utils.water import make_water_box


def small_basis(torchani=True):
    return ANIBasis.from_grids(
        num_species=3, Rcr=4.2, Rca=3.1,
        EtaR=[16.0], ShfR=[0.9, 1.7, 2.5, 3.3],
        EtaA=[8.0], Zeta=[32.0], ShfA=[0.9, 1.6, 2.3], ShfZ=[0.2, 1.2, 2.2],
        torchani=torchani)


def random_system(n=40, num_species=3, seed=0, box_width=9.0):
    rng = np.random.RandomState(seed)
    positions = rng.rand(n, 3).astype(np.float32) * box_width
    species = rng.randint(0, num_species, n).astype(np.int32)
    box = np.eye(3, dtype=np.float32) * box_width
    return positions, species, box


def oracle_aev(positions, species, basis, box):
    return compute_aev(jnp.asarray(positions), jnp.asarray(species), basis,
                       jnp.asarray(box))


@pytest.mark.parametrize('torchani', [True, False])
@pytest.mark.parametrize('seed', [0, 1])
def test_blocked_matches_oracle(torchani, seed):
    basis = small_basis(torchani)
    positions, species, box = random_system(seed=seed)
    layout = plan_blocked_layout(positions, box, species, basis.radial_cutoff,
                                 basis.angular_cutoff, basis.num_species)
    cl = CellList.create(box, basis.radial_cutoff, capacity=layout.rad_total)
    payload = build_blocked_payload(cl, jnp.asarray(positions),
                                    jnp.asarray(box), species, layout,
                                    basis.radial_cutoff, basis.angular_cutoff)
    got = compute_aev_blocked(payload, basis, layout)
    want = oracle_aev(positions, species, basis, box)
    np.testing.assert_allclose(got.radial, want.radial, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(got.angular, want.angular, rtol=2e-5, atol=2e-6)


def test_blocked_matches_oracle_chunked():
    basis = small_basis()
    positions, species, box = random_system(n=64, seed=3, box_width=11.0)
    layout = plan_blocked_layout(positions, box, species, basis.radial_cutoff,
                                 basis.angular_cutoff, basis.num_species)
    cl = CellList.create(box, basis.radial_cutoff, capacity=layout.rad_total)
    payload = build_blocked_payload(cl, jnp.asarray(positions),
                                    jnp.asarray(box), species, layout,
                                    basis.radial_cutoff, basis.angular_cutoff)
    got = compute_aev_blocked(payload, basis, layout, chunk_size=16)
    full = compute_aev_blocked(payload, basis, layout)
    np.testing.assert_allclose(got.radial, full.radial, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got.angular, full.angular, rtol=1e-5, atol=1e-7)


def test_blocked_with_verlet_skin_and_reuse():
    """Frozen selection stays valid while drift < skin/2 (radial AND the
    frozen angular sub-list)."""
    basis = small_basis()
    positions, species, box = random_system(n=48, seed=5, box_width=10.0)
    skin = 0.6
    layout = plan_blocked_layout(positions, box, species,
                                 basis.radial_cutoff + skin,
                                 basis.angular_cutoff + skin,
                                 basis.num_species, margin=1.4)
    cl = CellList.create(box, basis.radial_cutoff + skin,
                         capacity=layout.rad_total)
    sel = select_blocked(cl, jnp.asarray(positions), jnp.asarray(box),
                         species, layout, basis.radial_cutoff,
                         basis.angular_cutoff)
    rng = np.random.RandomState(7)
    for step in range(3):
        drift = (rng.rand(*positions.shape) - 0.5).astype(np.float32)
        drift *= 0.9 * skin / np.abs(drift).max() / 2 / 3   # < skin/2 total
        positions = positions + drift
        payload = payload_from_blocked(cl, jnp.asarray(positions),
                                       jnp.asarray(box), sel, layout=layout)
        got = compute_aev_blocked(payload, basis, layout)
        want = oracle_aev(positions, species, basis, box)
        np.testing.assert_allclose(got.radial, want.radial,
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(got.angular, want.angular,
                                   rtol=2e-5, atol=2e-6)


def test_blocked_forces_match_oracle():
    basis = small_basis()
    positions, species, box = random_system(n=32, seed=9, box_width=9.5)
    layout = plan_blocked_layout(positions, box, species, basis.radial_cutoff,
                                 basis.angular_cutoff, basis.num_species)
    cl = CellList.create(box, basis.radial_cutoff, capacity=layout.rad_total)

    def e_blocked(p):
        payload = build_blocked_payload(cl, p, jnp.asarray(box), species,
                                        layout, basis.radial_cutoff,
                                        basis.angular_cutoff)
        r, a = compute_aev_blocked(payload, basis, layout)
        return jnp.sum(r * r) + jnp.sum(a * a)

    def e_oracle(p):
        r, a = compute_aev(p, jnp.asarray(species), basis, jnp.asarray(box))
        return jnp.sum(r * r) + jnp.sum(a * a)

    g1 = jax.grad(e_blocked)(jnp.asarray(positions))
    g2 = jax.grad(e_oracle)(jnp.asarray(positions))
    np.testing.assert_allclose(g1, g2, rtol=5e-4, atol=5e-5)


def test_triple_tables_cover_all_pairs():
    layout = BlockedLayout(num_species=4, present=(0, 2, 3),
                           rad_caps=(5, 4, 3), ang_caps=(4, 3, 2))
    t = build_triple_tables(layout)
    # Every unordered lane pair across/within present blocks appears once.
    seen = set(zip(t.jj.tolist(), t.kk.tolist()))
    assert len(seen) == len(t.jj)
    offs = layout.ang_offsets
    expected = 0
    for i in range(3):
        for j in range(i, 3):
            ki, kj = layout.ang_caps[i], layout.ang_caps[j]
            expected += ki * (ki - 1) // 2 if i == j else ki * kj
    assert len(t.jj) == expected
    assert t.seg_bounds[-1] == expected
    # Segment pair ids are the unordered species-pair indices.
    from nnpops_tpu.ops.aev import species_pair_index
    table = species_pair_index(4)
    want_ids = [int(table[si, sj]) for n, si in enumerate((0, 2, 3))
                for sj in (0, 2, 3)[n:]]
    assert list(t.pair_ids) == want_ids


@pytest.mark.slow          # blocked impl is the legacy non-default path
def test_ani_model_blocked_impl_matches_payload_impl():
    water = make_water_box(48, seed=0)
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
    blocked = model.with_blocked_layout(water.positions, water.box)
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    cl = CellList.create(water.box, basis.radial_cutoff, capacity=96)

    e1, f1 = model.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = blocked.energy_and_forces_fused(params, pos, box, cl)
    np.testing.assert_allclose(e1, e2, rtol=1e-6)
    np.testing.assert_allclose(f1, f2, rtol=5e-4, atol=1e-5)

    # Sticky path: select once, step twice.
    sel = blocked.select(pos, box, cl)
    e3, f3 = blocked.energy_and_forces_from_selection(params, pos, box, cl, sel)
    np.testing.assert_allclose(e2, e3, rtol=1e-6)
    np.testing.assert_allclose(f2, f3, rtol=5e-4, atol=1e-5)
    blocked.check_overflow(pos, box, cl)


def test_blocked_overflow_observable():
    basis = small_basis()
    positions, species, box = random_system(n=40, seed=11, box_width=9.0)
    # Deliberately undersized layout: per-species caps of 1.
    present = tuple(int(s) for s in np.unique(species))
    layout = BlockedLayout(num_species=3, present=present,
                           rad_caps=(1,) * len(present),
                           ang_caps=(1,) * len(present))
    cl = CellList.create(box, basis.radial_cutoff, capacity=8)
    sel = select_blocked(cl, jnp.asarray(positions), jnp.asarray(box),
                         species, layout, basis.radial_cutoff,
                         basis.angular_cutoff)
    assert bool(sel.did_overflow(layout, cl.cell_capacity))
    assert int(jnp.max(sel.max_rad)) > 1


def test_mirror_vjp_matches_scatter_vjp():
    """The frozen-mirror adjoint of the payload gather equals XLA's
    scatter-add adjoint (requires symmetric lists = no overflow)."""
    from nnpops_tpu.neighbors.blocked import payload_from_blocked, select_blocked
    basis = small_basis()
    for seed, width in [(0, 9.0), (4, 10.5)]:
        positions, species, box = random_system(n=60, seed=seed,
                                                box_width=width)
        layout = plan_blocked_layout(positions, box, species,
                                     basis.radial_cutoff,
                                     basis.angular_cutoff, basis.num_species)
        cl = CellList.create(box, basis.radial_cutoff,
                             capacity=layout.rad_total)
        sel = select_blocked(cl, jnp.asarray(positions), jnp.asarray(box),
                             species, layout, basis.radial_cutoff,
                             basis.angular_cutoff)

        def loss(p, mirror):
            pay = payload_from_blocked(cl, p, jnp.asarray(box), sel,
                                       mirror_vjp=mirror, layout=layout)
            r, a = compute_aev_blocked(pay, basis, layout)
            return jnp.sum(r * r) + jnp.sum(a)

        p = jnp.asarray(positions)
        e1 = loss(p, True)
        e2 = loss(p, False)
        np.testing.assert_allclose(e1, e2, rtol=1e-6)
        g1 = jax.grad(loss)(p, True)
        g2 = jax.grad(loss)(p, False)
        np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-6)
