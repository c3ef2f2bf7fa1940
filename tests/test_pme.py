"""PME tests against OpenMM-computed golden values.

Mirrors the reference test suite (pme/TestPme.py): rectangular, triclinic and
exclusion cases with golden energies and forces (rtol 1e-4), charge-derivative
finite differences and chain-rule scaling, plus — as a deliberate superset —
second derivatives, which the reference explicitly forbids (TestPme.py:296-318).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.ops.pme import PME

# Fixtures from TestPme.py (positions/charges/boxes + OpenMM golden values).
POS_RECT = np.array([
    [0.7713206433, 0.02075194936, 0.6336482349],
    [0.7488038825, 0.4985070123, 0.2247966455],
    [0.1980628648, 0.7605307122, 0.1691108366],
    [0.08833981417, 0.6853598184, 0.9533933462],
    [0.003948266328, 0.5121922634, 0.8126209617],
    [0.6125260668, 0.7217553174, 0.2918760682],
    [0.9177741225, 0.7145757834, 0.542544368],
    [0.1421700476, 0.3733407601, 0.6741336151],
    [0.4418331744, 0.4340139933, 0.6177669785]], dtype=np.float32)
POS_TRI = np.array([
    [1.31396193, -0.9377441519, 0.9009447048],
    [1.246411648, 0.4955210369, -0.3256100634],
    [-0.4058114057, 1.281592137, -0.4926674903],
    [-0.7349805575, 1.056079455, 1.860180039],
    [-0.988155201, 0.5365767902, 1.437862885],
    [0.8375782005, 1.165265952, -0.1243717955],
    [1.753322368, 1.14372735, 0.627633104],
    [-0.5734898572, 0.1200222802, 1.022400845],
    [0.3254995233, 0.30204198, 0.8533009354]], dtype=np.float32)
CHARGES = np.array([(i - 4) * 0.1 for i in range(9)], dtype=np.float32)
BOX_RECT = np.diag([1.0, 1.1, 1.2]).astype(np.float32)
BOX_TRI = np.array([[1, 0, 0], [-0.1, 1.2, 0], [0.2, -0.15, 1.1]], dtype=np.float32)
NO_EXCL = np.zeros((9, 0), dtype=np.int32)


def grad_direct(pme, pos, q, cutoff, box):
    return np.asarray(jax.grad(
        lambda p: pme.compute_direct(p, jnp.asarray(q), cutoff, jnp.asarray(box)))(
            jnp.asarray(pos)))


def grad_recip(pme, pos, q, box):
    return np.asarray(jax.grad(
        lambda p: pme.compute_reciprocal(p, jnp.asarray(q), jnp.asarray(box)))(
            jnp.asarray(pos)))


def test_rectangular():
    """Golden energies/forces for a rectangular box (TestPme.py:16-63)."""
    pme = PME(14, 15, 16, 5, 4.985823141035867, 138.935, NO_EXCL)
    edir = float(pme.compute_direct(jnp.asarray(POS_RECT), jnp.asarray(CHARGES),
                                    0.5, jnp.asarray(BOX_RECT)))
    np.testing.assert_allclose(edir, 0.5811535194516182, rtol=1e-4)
    erec = float(pme.compute_reciprocal(jnp.asarray(POS_RECT), jnp.asarray(CHARGES),
                                        jnp.asarray(BOX_RECT)))
    np.testing.assert_allclose(erec, -90.92361028496651, rtol=1e-4)

    expected_ddirect = [[-0.4068958163, 1.128490567, 0.2531163692],
                        [8.175477028, -15.20702648, -5.499810219],
                        [-0.2548360825, 0.003096142784, -0.67370224],
                        [0.09854402393, 0.5804504156, 1.063418627],
                        [0, 0, 0],
                        [-7.859698296, 14.16478539, 5.236941814],
                        [0.684042871, -1.312145352, 0.7057141662],
                        [30.47141075, 6.726415634, -6.697656631],
                        [-30.90804291, -6.084065914, 5.611977577]]
    expected_drecip = [[-0.6407046318, -27.59628105, -3.745499372],
                       [30.76446915, -27.10591507, -82.14082336],
                       [-15.06353951, 10.37030602, -38.38755035],
                       [-7.421859741, 21.9861393, 39.86354828],
                       [0, 0, 0],
                       [-13.09759808, 6.393665314, 34.15939713],
                       [19.53832817, -59.55260849, 33.96843338],
                       [122.5542908, 60.35510254, -27.44270515],
                       [-136.679245, 15.14429855, 43.89074326]]
    np.testing.assert_allclose(grad_direct(pme, POS_RECT, CHARGES, 0.5, BOX_RECT),
                               expected_ddirect, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(grad_recip(pme, POS_RECT, CHARGES, BOX_RECT),
                               expected_drecip, rtol=1e-3, atol=2e-3)


def test_triclinic():
    """Golden energies/forces for a triclinic box (TestPme.py:65-112)."""
    pme = PME(14, 16, 15, 5, 5.0, 138.935, NO_EXCL)
    edir = float(pme.compute_direct(jnp.asarray(POS_TRI), jnp.asarray(CHARGES),
                                    0.5, jnp.asarray(BOX_TRI)))
    np.testing.assert_allclose(edir, -178.86083489656448, rtol=1e-4)
    erec = float(pme.compute_reciprocal(jnp.asarray(POS_TRI), jnp.asarray(CHARGES),
                                        jnp.asarray(BOX_TRI)))
    np.testing.assert_allclose(erec, -200.9420623172533, rtol=1e-4)
    expected_drecip = [[-162.9051514, 32.17734528, -77.43495178],
                       [11.11517906, 52.98329163, -83.18161011],
                       [34.50453186, 8.428194046, -4.691772938],
                       [-12.71308613, 20.7514267, -13.68377304],
                       [0, 0, 0],
                       [8.277475357, -3.927520275, 13.88403988],
                       [-34.93006897, -7.739934444, 8.986465454],
                       [45.33776474, -36.9358139, 40.34444809],
                       [111.2698975, -65.63329315, 115.8478012]]
    np.testing.assert_allclose(grad_recip(pme, POS_TRI, CHARGES, BOX_TRI),
                               expected_drecip, rtol=1e-3, atol=2e-3)


def test_exclusions():
    """Exclusion semantics (TestPme.py:114-171): direct space skips and
    compensates; reciprocal space is unchanged."""
    excl = np.array([[3, -1], [-1, -1], [-1, 3], [0, 2], [-1, -1],
                     [-1, -1], [-1, -1], [-1, 8], [7, -1]], dtype=np.int32)
    pme = PME(14, 16, 15, 5, 5.0, 138.935, excl)
    edir = float(pme.compute_direct(jnp.asarray(POS_TRI), jnp.asarray(CHARGES),
                                    0.5, jnp.asarray(BOX_TRI)))
    np.testing.assert_allclose(edir, -204.22671127319336, rtol=1e-4)
    erec = float(pme.compute_reciprocal(jnp.asarray(POS_TRI), jnp.asarray(CHARGES),
                                        jnp.asarray(BOX_TRI)))
    np.testing.assert_allclose(erec, -200.9420623172533, rtol=1e-4)
    expected_ddirect = [[-998.2406773, -314.4639407, 379.7956738],
                        [401.7656421, 153.7181283, -278.0072042],
                        [2136.789297, -634.4331203, -1062.13192],
                        [-0.6838558404, -0.7345126528, -3.655667043],
                        [0, 0, 0],
                        [0.05210044985, -2.530651058, 3.196419874],
                        [-2139.175743, 634.0007806, 1060.564263],
                        [21.9532636, -40.74009123, 38.42738517],
                        [577.5399728, 205.183407, -138.1889512]]
    np.testing.assert_allclose(grad_direct(pme, POS_TRI, CHARGES, 0.5, BOX_TRI),
                               expected_ddirect, rtol=2e-3, atol=2e-2)


def test_charge_derivatives():
    """Charge-gradient FD + chain rule (TestPme.py:173-236)."""
    excl = np.array([[6, -1], [-1, -1], [-1, -1], [6, -1], [-1, -1],
                     [-1, -1], [0, 3], [-1, -1], [-1, -1]], dtype=np.int32)
    pme = PME(14, 15, 16, 5, 4.985823141035867, 138.935, excl)
    pos = jnp.asarray(POS_RECT)
    box = jnp.asarray(BOX_RECT)

    ddir = np.asarray(jax.grad(lambda q: pme.compute_direct(pos, q, 0.5, box))(
        jnp.asarray(CHARGES)))
    drec = np.asarray(jax.grad(lambda q: pme.compute_reciprocal(pos, q, box))(
        jnp.asarray(CHARGES)))
    delta = 1e-3
    for i in range(9):
        c1, c2 = CHARGES.copy(), CHARGES.copy()
        c1[i] += delta
        c2[i] -= delta
        fd_dir = (float(pme.compute_direct(pos, jnp.asarray(c1), 0.5, box))
                  - float(pme.compute_direct(pos, jnp.asarray(c2), 0.5, box))) / (2 * delta)
        fd_rec = (float(pme.compute_reciprocal(pos, jnp.asarray(c1), box))
                  - float(pme.compute_reciprocal(pos, jnp.asarray(c2), box))) / (2 * delta)
        np.testing.assert_allclose(ddir[i], fd_dir, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(drec[i], fd_rec, rtol=1e-3, atol=2e-2)

    d2 = np.asarray(jax.grad(lambda q: 2.5 * pme.compute_direct(pos, q, 0.5, box))(
        jnp.asarray(CHARGES)))
    np.testing.assert_allclose(2.5 * ddir, d2, rtol=1e-5)


def test_second_derivatives_supported():
    """A deliberate superset of the reference: second derivatives work
    (the reference throws, TestPme.py:296-318)."""
    pme = PME(14, 16, 15, 5, 5.0, 138.935, NO_EXCL)
    pos = jnp.asarray(POS_TRI)
    box = jnp.asarray(BOX_TRI)

    def e_dir(p):
        return pme.compute_direct(p, jnp.asarray(CHARGES), 0.5, box)

    hvp = jax.grad(lambda p: jnp.sum(jax.grad(e_dir)(p) ** 2))(pos)
    assert np.isfinite(np.asarray(hvp)).all()

    def e_rec(p):
        return pme.compute_reciprocal(p, jnp.asarray(CHARGES), box)

    hvp2 = jax.grad(lambda p: jnp.sum(jax.grad(e_rec)(p) ** 2))(pos)
    assert np.isfinite(np.asarray(hvp2)).all()


def test_jit_whole_pme():
    """Direct + reciprocal in one jitted program (the jit test of
    TestPme.py:238-258, without a module system)."""
    pme = PME(14, 15, 16, 5, 4.985823141035867, 138.935, NO_EXCL)

    @jax.jit
    def total(pos, q, box):
        return (pme.compute_direct(pos, q, 0.5, box)
                + pme.compute_reciprocal(pos, q, box))

    e1 = float(total(jnp.asarray(POS_RECT), jnp.asarray(CHARGES), jnp.asarray(BOX_RECT)))
    e2 = (float(pme.compute_direct(jnp.asarray(POS_RECT), jnp.asarray(CHARGES), 0.5,
                                   jnp.asarray(BOX_RECT)))
          + float(pme.compute_reciprocal(jnp.asarray(POS_RECT), jnp.asarray(CHARGES),
                                         jnp.asarray(BOX_RECT))))
    np.testing.assert_allclose(e1, e2, rtol=1e-5)


@pytest.mark.slow          # O(N) chunked vs O(N*grid) scatter oracle
def test_chunked_spread_matches_scatter():
    """The scatter-free chunked spreading path (spread_charges_chunked) is
    exact against the direct scatter-add formulation — values, position
    gradients, and charge gradients — on cubic and triclinic boxes.

    The OpenMM golden tests above use grids indivisible by 8 and so keep
    covering the scatter path; this covers the dispatch the production
    grids take (bench_components uses power-of-two grids)."""
    from nnpops_tpu.config import PMEConfig
    from nnpops_tpu.geometry import invert_box
    from nnpops_tpu.ops.pme import (_chunkable, bspline_weights,
                                    spread_capacity, spread_charges,
                                    spread_charges_chunked, spread_overflow)

    def spread_scatter(positions, charges, box, config):
        gx, gy, gz = config.grid_shape
        order = config.order
        recip = invert_box(box)
        t = positions @ recip
        t = (t - jnp.floor(t)) * jnp.asarray([gx, gy, gz], positions.dtype)
        ti = jnp.floor(t)
        w = bspline_weights(t - ti, order)
        base = ti.astype(jnp.int32) % jnp.asarray([gx, gy, gz], jnp.int32)
        offsets = jnp.arange(order, dtype=jnp.int32)
        idx = (base[:, :, None] + offsets) % jnp.asarray(
            [gx, gy, gz], jnp.int32)[None, :, None]
        amp = charges * np.sqrt(config.coulomb)
        stencil = (amp[:, None, None, None] * w[:, 0, :, None, None]
                   * w[:, 1, None, :, None] * w[:, 2, None, None, :])
        flat = ((idx[:, 0, :, None, None] * gy + idx[:, 1, None, :, None])
                * gz + idx[:, 2, None, None, :])
        grid = jnp.zeros((gx * gy * gz,), positions.dtype)
        return grid.at[flat.reshape(-1)].add(
            stencil.reshape(-1)).reshape(gx, gy, gz)

    rng = np.random.RandomState(3)
    for g3, order, n in [((16, 16, 16), 5, 40), ((16, 24, 32), 4, 100),
                         ((16, 16, 16), 6, 7)]:
        cfg = PMEConfig(*g3, order, 3.04, 138.935)
        assert _chunkable(cfg)
        boxes = [np.diag([g3[0] * 0.9, g3[1] * 0.95, g3[2] * 1.0]),
                 np.array([[g3[0] * 0.9, 0.0, 0.0],
                           [2.0, g3[1] * 0.95, 0.0],
                           [-1.5, 1.0, g3[2] * 1.0]])]
        pos = jnp.asarray(rng.rand(n, 3) * 30 - 10, jnp.float32)
        q = jnp.asarray(rng.randn(n), jnp.float32)
        for bx in boxes:
            bx = jnp.asarray(bx, jnp.float32)
            a = spread_scatter(pos, q, bx, cfg)
            b = spread_charges_chunked(pos, q, bx, cfg)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)
            # spread_charges dispatches to the chunked path here
            c = spread_charges(pos, q, bx, cfg)
            np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=0)
            ga = jax.grad(lambda p: jnp.sum(
                spread_scatter(p, q, bx, cfg) ** 2))(pos)
            gb = jax.grad(lambda p: jnp.sum(
                spread_charges_chunked(p, q, bx, cfg) ** 2))(pos)
            scale = float(jnp.max(jnp.abs(ga))) + 1e-30
            np.testing.assert_allclose(np.asarray(ga) / scale,
                                       np.asarray(gb) / scale, atol=1e-5)
            gqa = jax.grad(lambda c_: jnp.sum(
                spread_scatter(pos, c_, bx, cfg) ** 2))(q)
            gqb = jax.grad(lambda c_: jnp.sum(
                spread_charges_chunked(pos, c_, bx, cfg) ** 2))(q)
            qs = float(jnp.max(jnp.abs(gqa))) + 1e-30
            np.testing.assert_allclose(np.asarray(gqa) / qs,
                                       np.asarray(gqb) / qs, atol=1e-5)
            assert int(spread_overflow(pos, q, bx, cfg)) <= spread_capacity(
                n, cfg)


def test_chunked_spread_overflow_reported():
    """Atoms beyond the per-chunk capacity are dropped softly and the true
    count is observable (the number_found_pairs contract,
    getNeighborPairs.py:77-83, applied to the spreading bins)."""
    from nnpops_tpu.config import PMEConfig
    from nnpops_tpu.ops.pme import spread_capacity, spread_overflow

    cfg = PMEConfig(16, 16, 16, 5, 3.04, 138.935)
    n = 600
    # All atoms piled into one chunk -> true count far above capacity.
    pos = jnp.asarray(np.random.RandomState(0).rand(n, 3) * 0.5, jnp.float32)
    q = jnp.ones((n,), jnp.float32)
    box = jnp.asarray(np.diag([16.0, 16.0, 16.0]), jnp.float32)
    assert int(spread_overflow(pos, q, box, cfg)) > spread_capacity(n, cfg)
