"""Slot-sticky (Verlet-skin) stepping: frozen-selection trajectories must
match per-step-rebuild trajectories exactly while displacements stay within
the skin."""
import jax
import jax.numpy as jnp
import numpy as np

from nnpops_tpu.config import ANIBasis
from nnpops_tpu.md.integrators import (initialize, langevin_baoab,
                                       run_md_sticky)
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.neighbors.cell_list import CellList
from nnpops_tpu.ops.aev import compute_aev_from_payload
from nnpops_tpu.ops.batched_nn import ensemble_energy
from nnpops_tpu.utils.water import make_water_box

SKIN = 1.0


def setup():
    water = make_water_box(300, seed=6)
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                         angular_capacity=32)
    params = init_ani_params(jax.random.PRNGKey(0), basis,
                             self_energies=np.linspace(-40, -1, 7))
    box = jnp.asarray(water.box)
    # Skinned cutoff: the selection stays valid across a block of steps.
    cl = CellList.create(water.box, basis.radial_cutoff + SKIN, capacity=128)
    onehot = jnp.asarray(model.species_onehot)

    def force_fn_of_sel(sel, pos):
        payload = cl.payload_from_selection(pos, box, sel, onehot)
        radial, angular = compute_aev_from_payload(payload, basis, 32)
        feat = jnp.concatenate([radial, angular], axis=1)
        e = ensemble_energy(params.ensemble, feat, model.grouping)

        def energy(p):
            pl = cl.payload_from_selection(p, box, sel, onehot)
            r, a = compute_aev_from_payload(pl, basis, 32)
            return ensemble_energy(params.ensemble,
                                   jnp.concatenate([r, a], axis=1),
                                   model.grouping)
        e, g = jax.value_and_grad(energy)(pos)
        return e, -g

    return water, model, params, box, cl, force_fn_of_sel


def test_sticky_matches_per_step_rebuild():
    water, model, params, box, cl, force_fn_of_sel = setup()
    masses = jnp.where(jnp.asarray(water.atomic_numbers) == 8, 16.0, 1.0)
    dt, friction, kT = 2e-4, 1.0, 0.596

    def fresh_force(pos):
        sel = cl.select(pos, box)
        return force_fn_of_sel(sel, pos)

    state0 = initialize(fresh_force, jnp.asarray(water.positions), masses, kT,
                        jax.random.PRNGKey(3))

    # Reference: refresh the selection EVERY step.
    final_a, e_a, stats_a = jax.jit(lambda s: run_md_sticky(
        lambda p: cl.select(p, box), force_fn_of_sel,
        lambda ff: langevin_baoab(ff, masses, dt, friction, kT),
        s, num_steps=8, refresh_every=1))(state0)

    # Sticky: one selection per 4-step block.
    final_b, e_b, stats_b = jax.jit(lambda s: run_md_sticky(
        lambda p: cl.select(p, box), force_fn_of_sel,
        lambda ff: langevin_baoab(ff, masses, dt, friction, kT),
        s, num_steps=8, refresh_every=4))(state0)

    # With dt this small, displacements are << skin/2, so both trajectories
    # see identical in-cutoff neighbor sets -> identical physics.
    np.testing.assert_allclose(np.asarray(final_a.positions),
                               np.asarray(final_b.positions),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(final_a.energy), float(final_b.energy),
                               rtol=1e-5)


def test_skinned_payload_matches_exact_cutoff():
    """AEV from a skinned selection == AEV from an exact-cutoff build."""
    water, model, params, box, cl, _ = setup()
    basis = model.basis
    onehot = jnp.asarray(model.species_onehot)
    pos = jnp.asarray(water.positions)
    skinned = cl.build_payload(pos, box, onehot)
    exact_cl = CellList.create(water.box, basis.radial_cutoff, capacity=96)
    exact = exact_cl.build_payload(pos, box, onehot)
    a = compute_aev_from_payload(skinned, basis, 40)
    b = compute_aev_from_payload(exact, basis, 40)
    np.testing.assert_allclose(np.asarray(a.radial), np.asarray(b.radial),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.angular), np.asarray(b.angular),
                               rtol=1e-5, atol=1e-6)
