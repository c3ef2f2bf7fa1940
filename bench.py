"""Benchmark: ANI-2x energy+forces on periodic water boxes, on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "us/step", "vs_baseline": N}

The headline metric is the BASELINE.md north star: ANI-2x force evaluation on
a 26k-atom solvated box, target < 2 ms/step on one TPU chip (the reference
publishes no numbers of its own — BASELINE.md). vs_baseline is
target_us / measured_us, so > 1.0 beats the target. The full MD step is
timed: cell-list rebuild + AEV + ensemble NN + forces, one jitted program.
"""
import argparse
import json
import sys
import time


def build_step(num_molecules: int, angular_capacity: int = 32,
               capacity: int = 96):
    import jax
    import jax.numpy as jnp
    from nnpops_tpu.config import ANIBasis
    from nnpops_tpu.models.ani import ANIModel, init_ani_params
    from nnpops_tpu.neighbors.cell_list import CellList
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(num_molecules, seed=0)
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                         angular_capacity=angular_capacity)
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    box = jnp.asarray(water.box)
    cell_list = CellList.create(water.box, basis.radial_cutoff, capacity=capacity)

    @jax.jit
    def step(params, positions):
        nlist = cell_list.build(positions, box)
        return model.energy_and_forces(params, positions, box=box,
                                       neighbors=nlist.indices)

    return step, params, jnp.asarray(water.positions)


def time_step(step, params, positions, iters: int = 20, warmup: int = 3):
    for _ in range(warmup):
        e, f = step(params, positions)
    f.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        e, f = step(params, positions)
    f.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e6   # us/step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--molecules', type=int, default=None,
                        help='override the water box size (molecules)')
    parser.add_argument('--iters', type=int, default=20)
    args = parser.parse_args()

    target_us = 2000.0   # BASELINE.md: < 2 ms/step at 26k atoms

    candidates = ([(args.molecules, f'ani2x_energy_forces_us_per_step_'
                    f'{args.molecules * 3}atom_water')] if args.molecules else
                  [(8670, 'ani2x_energy_forces_us_per_step_26k_water'),
                   (867, 'ani2x_energy_forces_us_per_step_2.6k_water')])

    for num_mol, metric in candidates:
        try:
            step, params, positions = build_step(num_mol)
            us = time_step(step, params, positions, iters=args.iters)
            print(json.dumps({'metric': metric, 'value': round(us, 1),
                              'unit': 'us/step',
                              'vs_baseline': round(target_us / us, 4)}))
            return
        except Exception as e:   # fall back to the smaller box (e.g. OOM)
            print(f'bench {metric} failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
    sys.exit(1)


if __name__ == '__main__':
    main()
