"""MD loop tests: NVE energy conservation, Langevin thermostat behavior,
single-compile scan trajectories, and checkpoint/resume determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpops_tpu.md.checkpoint import load_checkpoint, save_checkpoint
from nnpops_tpu.md.integrators import (MDState, initialize, kinetic_energy,
                                       langevin_baoab, run_md, velocity_verlet)

N = 16
MASSES = jnp.ones((N,)) * 2.0
KT = 0.5


def lj_force_fn_energy(positions):
    """A tiny Lennard-Jones-ish soft potential as the test force field."""
    delta = positions[None] - positions[:, None]
    d2 = jnp.sum(delta * delta, axis=-1) + jnp.eye(N)
    inv6 = 1.0 / (d2 ** 3)
    return jnp.sum(jnp.triu(inv6 * inv6 - inv6, k=1))


def force_fn(p):
    e = lj_force_fn_energy(p)
    return e, -jax.grad(lj_force_fn_energy)(p)


@pytest.fixture(scope='module')
def init_state():
    rng = np.random.RandomState(0)
    # Atoms on a loose grid so the LJ potential is well-behaved.
    grid = np.stack(np.meshgrid(*[np.arange(4)] * 2, [0], indexing='ij'),
                    axis=-1).reshape(-1, 3)[:N] * 1.5
    pos = jnp.asarray(grid + 0.05 * rng.randn(N, 3), jnp.float32)
    return initialize(force_fn, pos, MASSES, KT, jax.random.PRNGKey(0))


def test_nve_energy_conservation(init_state):
    """Velocity Verlet conserves total energy to O(dt^2)."""
    step = velocity_verlet(force_fn, MASSES, dt=0.002)
    state = init_state
    e0 = float(state.energy + kinetic_energy(state, MASSES))
    final, _ = jax.jit(lambda s: run_md(step, s, 500))(state)
    e1 = float(final.energy + kinetic_energy(final, MASSES))
    assert abs(e1 - e0) < 5e-3 * max(1.0, abs(e0))


def test_langevin_thermalizes(init_state):
    """BAOAB drives kinetic energy toward (3/2) N kT."""
    step = langevin_baoab(force_fn, MASSES, dt=0.005, friction=5.0, kT=KT)
    final, energies = jax.jit(lambda s: run_md(step, s, 2000))(init_state)
    ke = float(kinetic_energy(final, MASSES))
    target = 1.5 * N * KT
    assert 0.4 * target < ke < 2.0 * target
    assert np.isfinite(np.asarray(energies)).all()
    assert int(final.step) == 2000


def test_scan_compiles_once(init_state):
    step = langevin_baoab(force_fn, MASSES, dt=0.002, friction=1.0, kT=KT)
    runner = jax.jit(lambda s: run_md(step, s, 50, record_every=10))
    s1, e1 = runner(init_state)
    s2, e2 = runner(s1)
    assert runner._cache_size() == 1
    assert e1.shape == (5,)


def test_checkpoint_resume_exact(tmp_path, init_state):
    """Save at step k, resume, and get bit-identical trajectories."""
    step = langevin_baoab(force_fn, MASSES, dt=0.002, friction=1.0, kT=KT)
    runner = jax.jit(lambda s: run_md(step, s, 100)[0])
    mid = runner(init_state)
    path = str(tmp_path / 'state.npz')
    save_checkpoint(path, mid)
    restored = load_checkpoint(path, mid)
    final_a = runner(mid)
    final_b = runner(restored)
    np.testing.assert_array_equal(np.asarray(final_a.positions),
                                  np.asarray(final_b.positions))
    np.testing.assert_array_equal(np.asarray(final_a.velocities),
                                  np.asarray(final_b.velocities))


def test_checkpoint_shape_mismatch_raises(tmp_path, init_state):
    path = str(tmp_path / 'state.npz')
    save_checkpoint(path, init_state)
    bad_template = init_state._replace(positions=jnp.zeros((N + 1, 3)))
    with pytest.raises(ValueError):
        load_checkpoint(path, bad_template)


@pytest.mark.slow          # physics-integration (NVE drift) check
def test_ani_nve_energy_conservation():
    """NVE with the fused ANI path: total energy drift stays small over a
    500-step velocity-Verlet trajectory (the MD-health metric tracked by
    utils.profiling.EnergyDriftMonitor)."""
    from nnpops_tpu.config import ANIBasis
    from nnpops_tpu.models.ani import ANIModel, init_ani_params
    from nnpops_tpu.neighbors.cell_list import CellList
    from nnpops_tpu.utils.profiling import EnergyDriftMonitor
    from nnpops_tpu.utils.water import make_water_box

    water = make_water_box(40, seed=8)   # 120 atoms, dense fallback cell list
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(water.atomic_numbers, basis,
                                         angular_capacity=24)
    params = init_ani_params(jax.random.PRNGKey(0), basis)
    box = jnp.asarray(water.box)
    cells = CellList.create(water.box, basis.radial_cutoff, capacity=96)

    def force_fn(pos):
        return model.energy_and_forces_fused(params, pos, box, cells)

    masses = jnp.where(jnp.asarray(water.atomic_numbers) == 8, 16.0, 1.0)
    state = initialize(force_fn, jnp.asarray(water.positions), masses,
                       kT=0.02, key=jax.random.PRNGKey(5))
    dt = 2e-4
    step = velocity_verlet(force_fn, masses, dt)
    monitor = EnergyDriftMonitor(tolerance_per_ps=None)
    runner = jax.jit(lambda s: run_md(step, s, 100, record_every=100))
    for block in range(5):
        state, _ = runner(state)
        total = float(state.energy + kinetic_energy(state, masses))
        monitor.record(float(state.step) * dt, total)
    e0, e_last = monitor.energies[0], monitor.energies[-1]
    assert abs(e_last - e0) < 5e-3 * max(1.0, abs(e0)), monitor.energies
