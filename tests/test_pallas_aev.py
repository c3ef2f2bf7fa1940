"""Fused Pallas angular-AEV kernel vs the XLA blocked path (interpret mode
on CPU; the same comparison runs compiled on real TPU hardware)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.neighbors.blocked import plan_blocked_layout, build_blocked_payload
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.aev_blocked import compute_aev_blocked
from nnpops_tpu.ops.pallas_aev import angular_aev_pallas


def small_basis(torchani=True):
    return ANIBasis.from_grids(
        num_species=3, Rcr=4.2, Rca=3.1,
        EtaR=[16.0], ShfR=[0.9, 1.7, 2.5, 3.3],
        EtaA=[8.0], Zeta=[14.1], ShfA=[0.9, 1.6, 2.3], ShfZ=[0.2, 1.2, 2.2],
        torchani=torchani)


def make_payload(basis, n=40, seed=0, box_width=9.0):
    rng = np.random.RandomState(seed)
    positions = rng.rand(n, 3).astype(np.float32) * box_width
    species = rng.randint(0, 3, n).astype(np.int32)
    box = np.eye(3, dtype=np.float32) * box_width
    layout = plan_blocked_layout(positions, box, species, basis.radial_cutoff,
                                 basis.angular_cutoff, basis.num_species)
    cl = CellList.create(box, basis.radial_cutoff, capacity=layout.rad_total)
    payload = build_blocked_payload(cl, jnp.asarray(positions),
                                    jnp.asarray(box), species, layout,
                                    basis.radial_cutoff, basis.angular_cutoff)
    return payload, layout


@pytest.mark.parametrize('torchani', [True, False])
def test_pallas_angular_matches_xla(torchani):
    basis = small_basis(torchani)
    payload, layout = make_payload(basis, seed=1)
    want = compute_aev_blocked(payload, basis, layout).angular
    got = angular_aev_pallas(payload.ang_deltas, payload.ang_mask, basis,
                             layout, block_size=16)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)


@pytest.mark.parametrize('torchani', [True, False])
def test_pallas_angular_gradient_matches_xla(torchani):
    basis = small_basis(torchani)
    payload, layout = make_payload(basis, seed=2)

    def loss_pallas(d):
        a = angular_aev_pallas(d, payload.ang_mask, basis, layout,
                               block_size=16)
        return jnp.sum(a * a)

    def loss_xla(d):
        # Recompute ang_r from d (the kernel derives r from deltas itself).
        r = jnp.sqrt(jnp.where(payload.ang_mask,
                               jnp.sum(d * d, axis=0), 1.0))
        r = jnp.where(payload.ang_mask, r, 0.0)
        a = compute_aev_blocked(payload._replace(ang_deltas=d, ang_r=r),
                                basis, layout).angular
        return jnp.sum(a * a)

    g1 = jax.grad(loss_pallas)(payload.ang_deltas)
    g2 = jax.grad(loss_xla)(payload.ang_deltas)
    np.testing.assert_allclose(g1, g2, rtol=2e-4, atol=2e-5)


def test_pallas_angular_fast_pow_matches_split():
    """pow_impl='fast' (dyadic exp2/log2 polynomial pow) stays within
    float32 noise of the exp/log path, values and gradients. The fast
    path measured SLOWER on the production chip (benchmarks/probe_pow.py,
    NOTES_PERF round-3 session 4) so 'split' stays the default; this keeps
    the alternate correctness-tested."""
    basis = small_basis()
    payload, layout = make_payload(basis, seed=4)
    kw = dict(basis=basis, layout=layout, block_size=16)
    want = angular_aev_pallas(payload.ang_deltas, payload.ang_mask, **kw)
    got = angular_aev_pallas(payload.ang_deltas, payload.ang_mask,
                             pow_impl='fast', **kw)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)

    def loss(d, impl):
        a = angular_aev_pallas(d, payload.ang_mask, pow_impl=impl, **kw)
        return jnp.sum(a * a)

    g1 = jax.grad(loss)(payload.ang_deltas, 'split')
    g2 = jax.grad(loss)(payload.ang_deltas, 'fast')
    np.testing.assert_allclose(g1, g2, rtol=2e-4, atol=2e-5)


def test_pallas_angular_fc_poly_matches_cos():
    """fc_impl='poly' (degree-8 Horner chain in (r/ra)^2, the production
    default: measured faster than cos/sin on the chip, NOTES_PERF round-3
    session 5) stays within float32 noise of the transcendental form,
    values and gradients."""
    basis = small_basis()
    payload, layout = make_payload(basis, seed=5)
    kw = dict(basis=basis, layout=layout, block_size=16)
    want = angular_aev_pallas(payload.ang_deltas, payload.ang_mask,
                              fc_impl='cos', **kw)
    got = angular_aev_pallas(payload.ang_deltas, payload.ang_mask,
                             fc_impl='poly', **kw)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)

    def loss(d, impl):
        a = angular_aev_pallas(d, payload.ang_mask, fc_impl=impl, **kw)
        return jnp.sum(a * a)

    g1 = jax.grad(loss)(payload.ang_deltas, 'cos')
    g2 = jax.grad(loss)(payload.ang_deltas, 'poly')
    np.testing.assert_allclose(g1, g2, rtol=2e-4, atol=2e-5)


def test_window_radial_fc_poly_matches_cos():
    """Same for the window radial kernel: poly cutoff vs transcendental on
    a tiny synthetic window, values and position gradients."""
    from nnpops_tpu.ops.pallas_window import window_radial_aev
    rng = np.random.RandomState(7)
    cell_caps = (4, 4)
    c = sum(cell_caps)
    ncells, kk = 4, 27 * c
    ctr = jnp.asarray(rng.rand(ncells, c, 3).astype(np.float32) * 3.0)
    cand = rng.rand(3, ncells, kk).astype(np.float32) * 6.0 - 1.5
    cx, cy, cz = (jnp.asarray(cand[i]) for i in range(3))

    def run(cx, cy, cz, ctr, impl):
        return window_radial_aev(cx, cy, cz, ctr, 4.2, (16.0,),
                                 (0.9, 1.7, 2.5, 3.3), cell_caps, True,
                                 fc_impl=impl)

    want = run(cx, cy, cz, ctr, 'cos')
    got = run(cx, cy, cz, ctr, 'poly')
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)

    g = [jax.grad(lambda *a, i=i: jnp.sum(run(*a, i) ** 2),
                  argnums=(0, 1, 2, 3))(cx, cy, cz, ctr)
         for i in ('cos', 'poly')]
    for a, b in zip(*g):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-5)


def test_pallas_angular_block_padding():
    """N not a multiple of the block size pads internally and strips back."""
    basis = small_basis()
    payload, layout = make_payload(basis, n=37, seed=3)
    want = compute_aev_blocked(payload, basis, layout).angular
    got = angular_aev_pallas(payload.ang_deltas, payload.ang_mask, basis,
                             layout, block_size=32)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)


def test_pallas_requires_factored_grid():
    basis = ANIBasis(num_species=2, radial_cutoff=4.0, angular_cutoff=3.0,
                     radial_eta=(16.0,), radial_rs=(1.0,),
                     angular_eta=(8.0, 4.0), angular_rs=(1.0, 2.0),
                     angular_zeta=(14.1, 8.0), angular_thetas=(0.5, 1.5))
    payload, layout = None, None
    from nnpops_tpu.ops.pallas_aev import make_angular_kernel
    from nnpops_tpu.neighbors.blocked import BlockedLayout
    lay = BlockedLayout(num_species=2, present=(0, 1), rad_caps=(4, 4),
                        ang_caps=(3, 3))
    with pytest.raises(NotImplementedError):
        make_angular_kernel(basis, lay)


def test_ani_model_pallas_impl_matches_blocked():
    from nnpops_tpu.models.ani import ANIModel, init_ani_params
    from nnpops_tpu.utils.water import make_water_box
    water = make_water_box(48, seed=0)
    basis = ANIBasis.ani2x()
    base = ANIModel.from_atomic_numbers(water.atomic_numbers, basis)
    blocked = base.with_blocked_layout(water.positions, water.box)
    pallas = base.with_blocked_layout(water.positions, water.box,
                                      impl='pallas')
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    box = jnp.asarray(water.box)
    pos = jnp.asarray(water.positions)
    cl = CellList.create(water.box, basis.radial_cutoff,
                         capacity=blocked.blocked_layout.rad_total)
    e1, f1 = blocked.energy_and_forces_fused(params, pos, box, cl)
    e2, f2 = pallas.energy_and_forces_fused(params, pos, box, cl)
    np.testing.assert_allclose(e1, e2, rtol=1e-6)
    np.testing.assert_allclose(f1, f2, rtol=1e-3, atol=1e-5)


def test_pallas_from_rad_matches_ang_payload():
    """Rad-only payload + in-kernel angular extraction == explicit angular
    payload (values and gradients through positions)."""
    from nnpops_tpu.neighbors.blocked import (payload_from_blocked,
                                              select_blocked)
    basis = small_basis()
    rng = np.random.RandomState(4)
    n = 48
    positions = rng.rand(n, 3).astype(np.float32) * 10.0
    species = rng.randint(0, 3, n).astype(np.int32)
    box = np.eye(3, dtype=np.float32) * 10.0
    from nnpops_tpu.neighbors.blocked import plan_blocked_layout
    layout = plan_blocked_layout(positions, box, species, basis.radial_cutoff,
                                 basis.angular_cutoff, basis.num_species)
    cl = CellList.create(box, basis.radial_cutoff, capacity=layout.rad_total)
    sel = select_blocked(cl, jnp.asarray(positions), jnp.asarray(box),
                         species, layout, basis.radial_cutoff,
                         basis.angular_cutoff)

    def loss(p, rad_only):
        pay = payload_from_blocked(cl, p, jnp.asarray(box), sel,
                                   rad_only=rad_only, layout=layout)
        r, a = compute_aev_blocked(pay, basis, layout, angular_impl='pallas')
        return jnp.sum(r * r) + jnp.sum(a * a), a

    p = jnp.asarray(positions)
    (e1, a1) = loss(p, True)
    (e2, a2) = loss(p, False)
    np.testing.assert_allclose(a1, a2, rtol=1e-5, atol=1e-7)
    g1 = jax.grad(lambda q: loss(q, True)[0])(p)
    g2 = jax.grad(lambda q: loss(q, False)[0])(p)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-6)
