"""Scalable PME path (cell-list pairs) and the ANI+PME combined force field."""
import jax
import jax.numpy as jnp
import numpy as np

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.models.combined import ANIWithPME
from nnpops_tpu.neighbors.cell_list import CellList, neighbor_list_to_pairs
from nnpops_tpu.neighbors.pairs import neighbor_pairs_masked
from nnpops_tpu.ops.pme import PME, pme_direct_energy
from nnpops_tpu.utils.water import make_water_box


def test_pme_direct_via_cell_list_pairs():
    """PME direct space over cell-list-derived pairs == over the O(N^2)
    enumeration (the scalable production path)."""
    water = make_water_box(300, seed=9)
    n = len(water.positions)
    pos = jnp.asarray(water.positions)
    box = jnp.asarray(water.box)
    q = jnp.asarray(water.charges)
    excl = jnp.full((n, 1), -1, jnp.int32)
    cutoff = 5.0

    all_pairs = neighbor_pairs_masked(pos, cutoff, box_vectors=box)
    e_ref = float(pme_direct_energy(pos, q, all_pairs, excl, 0.5, 138.935))

    cl = CellList.create(water.box, cutoff, capacity=96)
    nlist = cl.build(pos, box)
    cl_pairs = neighbor_list_to_pairs(nlist, pos, box)
    e_cl = float(pme_direct_energy(pos, q, cl_pairs, excl, 0.5, 138.935))
    np.testing.assert_allclose(e_cl, e_ref, rtol=1e-5)


def test_ani_with_pme_energy_forces():
    """Combined ANI+PME: energy decomposes into its parts and forces match
    finite differences."""
    water = make_water_box(150, seed=10)
    n = len(water.positions)
    basis = ANIBasis.ani2x()
    ani = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                       angular_capacity=32)
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    pme = PME(16, 16, 16, 5, 0.6, 1389.35457, np.full((n, 1), -1, np.int32))
    ff = ANIWithPME(ani=ani, pme=pme, pme_cutoff=5.0)
    box = jnp.asarray(water.box)
    cl = CellList.create(water.box, basis.radial_cutoff, capacity=96)
    pos = jnp.asarray(water.positions)
    q = jnp.asarray(water.charges)

    e, f = jax.jit(lambda pr, p: ff.energy_and_forces(pr, p, q, box, cl))(params, pos)
    assert np.isfinite(float(e)) and np.isfinite(np.asarray(f)).all()

    # Decomposition: combined == ANI alone + PME alone (same neighbor data).
    e_ani = float(ani.energy_fused(params, pos, box, cl))
    pairs = neighbor_pairs_masked(pos, 5.0, box_vectors=box)
    from nnpops_tpu.ops.pme import (pme_direct_energy, pme_reciprocal_energy,
                                    pme_self_energy)
    e_pme = (float(pme_direct_energy(pos, q, pairs, pme.exclusions, 0.6, 1389.35457))
             + float(pme_self_energy(q, 0.6, 1389.35457))
             + float(pme_reciprocal_energy(pos, q, box, pme.config, pme.moduli)))
    np.testing.assert_allclose(float(e), e_ani + e_pme, rtol=1e-4)

    # FD force check along the force direction.
    fnp = np.asarray(f)
    norm = np.linalg.norm(fnp)
    d = 1e-3 / norm
    energy = jax.jit(lambda p: ff.energy(params, p, q, box, cl))
    ep = float(energy(pos + d * f))
    em = float(energy(pos - d * f))
    np.testing.assert_allclose(norm, (em - ep) / (2e-3), rtol=5e-3, atol=1e-4)
