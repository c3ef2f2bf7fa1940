"""Runnable demonstrations of the five BASELINE.json configurations.

Usage: python examples/run_configs.py [1|2|3|4|5|all] [--platform cpu]

1. ANI-2x AEV + ensemble energy/forces, gas-phase methanol
2. SchNet CFConv message passing on an aspirin-sized molecule
3. Periodic cell-list neighbors + ANI-2x on a 2.6k-atom water box
4. PME direct+reciprocal electrostatics on a water box
5. Full ANI + PME MD loop: 1000 Langevin steps under jax.lax.scan
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def config1():
    """Gas-phase methanol: energy + forces through the composite model."""
    import jax, jax.numpy as jnp, numpy as np
    from nnpops_tpu.config import ANIBasis
    from nnpops_tpu.models.ani import ANIModel, init_ani_params

    z = [6, 1, 1, 1, 8, 1]
    pos = jnp.asarray([[-0.046, 0.663, 0.0], [-1.097, 0.904, 0.174],
                       [0.574, 1.217, 0.705], [0.137, 0.947, -1.026],
                       [0.117, -0.716, 0.152], [1.061, -0.898, 0.033]],
                      jnp.float32)
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(z, basis)
    params = init_ani_params(jax.random.PRNGKey(0), basis,
                             self_energies=np.linspace(-40, -1, 7))
    e, f = jax.jit(model.energy_and_forces)(params, pos)
    print(f'[1] methanol: E = {float(e):.6f}, max|F| = {float(jnp.abs(f).max()):.4f}')


def config2():
    """SchNet CFConv stack on an aspirin-sized (21-atom) molecule."""
    import jax, jax.numpy as jnp, numpy as np
    from nnpops_tpu.config import CFConvConfig
    from nnpops_tpu.models.schnet import SchNetModel

    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(21, 3).astype(np.float32) * 6)
    species = jnp.asarray(rng.randint(0, 3, 21), jnp.int32)
    cfg = CFConvConfig(width=128, num_gaussians=50, cutoff=10.0,
                       gaussian_width=10.0 / 49)
    model = SchNetModel(cfg, num_species=3, num_interactions=3)
    sparams = model.init(jax.random.PRNGKey(1))
    e, f = jax.jit(model.energy_and_forces)(sparams, pos, species)
    print(f'[2] schnet aspirin-like: E = {float(e):.4f}, '
          f'max|F| = {float(jnp.abs(f).max()):.4f}')


def config3():
    """Periodic 2.6k-atom water box with cell-list neighbors (fused path)."""
    import jax, jax.numpy as jnp
    from nnpops_tpu.config import ANIBasis
    from nnpops_tpu.models.ani import ANIModel, init_ani_params
    from nnpops_tpu.neighbors.cell_list import CellList
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(867)
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                         angular_capacity=32)
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    box = jnp.asarray(water.box)
    cells = CellList.create(water.box, basis.radial_cutoff, capacity=96)
    step = jax.jit(lambda pr, p: model.energy_and_forces_fused(pr, p, box, cells))
    e, f = step(params, jnp.asarray(water.positions))
    print(f'[3] 2601-atom water box: E = {float(e):.4f}, '
          f'max|F| = {float(jnp.abs(f).max()):.4f}')


def config4():
    """PME electrostatics (direct + reciprocal + self) on a water box."""
    import jax, jax.numpy as jnp, numpy as np
    from nnpops_tpu.ops.pme import PME
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(867)
    n = len(water.positions)
    pme = PME(32, 32, 32, 5, 0.4, 1389.35457, np.zeros((n, 0), np.int32))
    box = jnp.asarray(water.box)
    q = jnp.asarray(water.charges)

    @jax.jit
    def total(pos):
        def energy(p):
            return (pme.compute_direct(p, q, 9.0, box, max_num_pairs=n * 64)
                    + pme.compute_reciprocal(p, q, box))
        return jax.value_and_grad(energy)(pos)

    e, g = total(jnp.asarray(water.positions))
    print(f'[4] PME {n} atoms: E = {float(e):.2f}, '
          f'max|F| = {float(jnp.abs(g).max()):.2f}')


def config5():
    """1000 Langevin steps of ANI + PME under one lax.scan (450-atom box)."""
    import jax, jax.numpy as jnp, numpy as np
    from nnpops_tpu.config import ANIBasis
    from nnpops_tpu.md.integrators import initialize, langevin_baoab, run_md
    from nnpops_tpu.models.ani import ANIModel, init_ani_params
    from nnpops_tpu.models.combined import ANIWithPME
    from nnpops_tpu.ops.pme import PME
    from nnpops_tpu.neighbors.cell_list import CellList
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(150)
    n = len(water.positions)
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                         angular_capacity=32)
    params = init_ani_params(jax.random.PRNGKey(0), basis,
                             self_energies=np.linspace(-40, -1, 7))
    pme = PME(16, 16, 16, 5, 0.6, 1389.35457, np.full((n, 1), -1, np.int32))
    ff = ANIWithPME(ani=model, pme=pme, pme_cutoff=5.0)
    box = jnp.asarray(water.box)
    # Scaled-down charges: with random NN weights there is no short-range
    # repulsion to balance full TIP3P electrostatics (real runs load trained
    # weights via utils.torchani_io).
    charges = jnp.asarray(water.charges) * 0.2
    cells = CellList.create(water.box, basis.radial_cutoff, capacity=96)

    def force_fn(pos):
        return ff.energy_and_forces(params, pos, charges, box, cells)

    masses = jnp.where(jnp.asarray(water.atomic_numbers) == 8, 16.0, 1.0)
    state = initialize(force_fn, jnp.asarray(water.positions), masses,
                       kT=0.596, key=jax.random.PRNGKey(1))
    step = langevin_baoab(force_fn, masses, dt=2e-4, friction=5.0, kT=0.596)
    t0 = time.time()
    final, energies = jax.jit(lambda s: run_md(step, s, 1000, record_every=100))(state)
    jax.block_until_ready(final.positions)
    # Overflow contract: verify no static neighbor capacity was exceeded
    # during the trajectory (checked between scanned segments, never inside).
    model.check_overflow(final.positions, box, cells)
    print(f'[5] 1000 Langevin steps ({len(masses)} atoms) in '
          f'{time.time() - t0:.1f} s; energy {float(energies[0]):.3f} -> '
          f'{float(energies[-1]):.3f}, finite: '
          f'{bool(jnp.isfinite(final.positions).all())}')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('which', nargs='?', default='all')
    parser.add_argument('--platform', default=None, choices=[None, 'cpu'])
    args = parser.parse_args()
    if args.platform == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
    configs = {'1': config1, '2': config2, '3': config3, '4': config4,
               '5': config5}
    for name, fn in configs.items():
        if args.which in (name, 'all'):
            fn()


if __name__ == '__main__':
    main()
