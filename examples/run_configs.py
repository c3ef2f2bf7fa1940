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


def config5(num_molecules=150, num_steps=1000):
    """ANI + PME Langevin MD under one lax.scan, on the production fast
    paths (window-mode ANI + window-kernel PME direct + chunked reciprocal)
    with slot-sticky Verlet-skin stepping.

    BASELINE config 5 calls for a solvated-protein-scale box; this demo
    runs a periodic WATER box whose size is set by ``num_molecules``
    (default 450 atoms so the CPU interpreter can run it in CI; pass
    8670 molecules for the 26k-atom production workload on a real chip —
    see ``--molecules``). Random NN weights, so charges are scaled down
    0.2x: there is no trained short-range repulsion to balance full TIP3P
    electrostatics (real runs load trained weights via utils.torchani_io).
    """
    import jax, jax.numpy as jnp, numpy as np
    from nnpops_tpu.config import ANIBasis
    from nnpops_tpu.md.integrators import (initialize, langevin_baoab,
                                           run_md_sticky_counts)
    from nnpops_tpu.models.ani import ANIModel, init_ani_params
    from nnpops_tpu.models.combined import ANIWithPME
    from nnpops_tpu.ops.pme import PME
    from nnpops_tpu.utils.water import make_water_box

    skin, refresh = 0.25, 5
    water = make_water_box(num_molecules)
    n = len(water.positions)
    big = n >= 2000             # production sizes: bf16 fused ensemble
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(
        water.atomic_numbers, basis, angular_capacity=32,
        nn_dtype='bfloat16' if big else None,
        nn_impl='fused' if big else 'xla')
    model = model.with_blocked_layout(water.positions, water.box,
                                      impl='window', skin=skin)
    params = init_ani_params(jax.random.PRNGKey(0), basis,
                             self_energies=np.linspace(-40, -1, 7))
    grid = max(16, int(2 ** np.ceil(np.log2(water.box[0][0]))))
    pme = PME(grid, grid, grid, 5, 0.6, 1389.35457,
              np.full((n, 1), -1, np.int32))
    ff = ANIWithPME.create(ani=model, pme=pme, pme_cutoff=5.0,
                           positions=water.positions, box=water.box)
    box = jnp.asarray(water.box)
    charges = jnp.asarray(water.charges) * 0.2
    cells = model.create_cell_list(water.box, skin=skin)

    def select_fn(pos):
        return ff.select(pos, box, cells)

    def force_fn_of_sel(sel, pos):
        return ff.energy_and_forces_from_selection(params, pos, charges,
                                                   box, cells, sel)

    def counts_fn(sel, pos):
        return ff.overflow_counts(pos, charges, box, cells, sel)

    masses = jnp.where(jnp.asarray(water.atomic_numbers) == 8, 16.0, 1.0)
    state = initialize(lambda p: force_fn_of_sel(select_fn(p), p),
                       jnp.asarray(water.positions), masses,
                       kT=0.596, key=jax.random.PRNGKey(1))
    run = jax.jit(lambda s: run_md_sticky_counts(
        select_fn, force_fn_of_sel,
        lambda f: langevin_baoab(f, masses, dt=2e-4, friction=5.0, kT=0.596),
        s, num_steps, refresh, counts_fn))
    final, energies, stats = run(state)      # compile + warmup trajectory
    jax.block_until_ready(final.positions)
    t0 = time.time()                         # steady-state timing, 2nd call
    final, energies, stats = run(state)
    jax.block_until_ready(final.positions)
    dt_wall = time.time() - t0
    # Overflow contract, checked on the host AFTER the scan from the
    # accumulated true counts (never inside the jitted trajectory).
    ff.check_overflow(final.positions, charges, box, cells)
    drift = float(energies[-1]) - float(energies[0])
    print(f'[5] {num_steps} Langevin steps ({len(masses)} atoms, ANI window '
          f'+ PME window/chunked, sticky refresh {refresh}) in '
          f'{dt_wall:.1f} s ({dt_wall / num_steps * 1e3:.2f} ms/step); '
          f'energy {float(energies[0]):.3f} -> {float(energies[-1]):.3f} '
          f'(drift {drift:+.3f}), finite: '
          f'{bool(jnp.isfinite(final.positions).all())}')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('which', nargs='?', default='all')
    parser.add_argument('--platform', default=None, choices=[None, 'cpu'])
    parser.add_argument('--molecules', type=int, default=150,
                        help='water-box size for config 5 (150 = 450 atoms; '
                             '8670 = the 26k-atom production workload)')
    parser.add_argument('--steps', type=int, default=1000,
                        help='MD steps for config 5')
    args = parser.parse_args()
    if args.platform == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
    configs = {'1': config1, '2': config2, '3': config3, '4': config4,
               '5': lambda: config5(args.molecules, args.steps)}
    for name, fn in configs.items():
        if args.which in (name, 'all'):
            fn()


if __name__ == '__main__':
    main()
