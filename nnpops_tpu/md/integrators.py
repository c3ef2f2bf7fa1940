"""MD integrators as pure step functions under ``jax.lax.scan``.

The reference has no MD loop (it plugs kernels into someone else's); the
BASELINE north star requires one ("Full OptimizedTorchANI MD loop: 1000
Langevin steps under jax.lax.scan"). The whole trajectory compiles into a
single XLA program: the force field, the integrator update and the RNG all
live inside one scan body with static shapes.

Integrators:
* ``langevin_baoab`` — the BAOAB splitting of Langevin dynamics
  (Leimkuhler & Matthews 2013), one force evaluation per step.
* ``velocity_verlet`` — NVE, used for energy-drift validation.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
ForceFn = Callable[[Array], Tuple[Array, Array]]   # positions -> (energy, forces)


class MDState(NamedTuple):
    """Simulation state — a pure pytree, trivially checkpointable (SURVEY §5:
    'MD state (positions, velocities, RNG key) checkpoints as a pytree')."""
    positions: Array    # [N, 3]
    velocities: Array   # [N, 3]
    forces: Array       # [N, 3] forces at `positions` (carried for one-force-eval steps)
    energy: Array       # [] potential energy at `positions`
    key: Array          # jax PRNG key
    step: Array         # [] int32


def initialize(force_fn: ForceFn, positions: Array, masses: Array, kT: float,
               key) -> MDState:
    """Initial state with Maxwell-Boltzmann velocities."""
    key, sub = jax.random.split(key)
    sigma = jnp.sqrt(kT / masses)[:, None]
    velocities = sigma * jax.random.normal(sub, positions.shape, positions.dtype)
    energy, forces = force_fn(positions)
    return MDState(positions, velocities, forces, energy, key,
                   jnp.zeros((), jnp.int32))


def langevin_baoab(force_fn: ForceFn, masses: Array, dt: float,
                   friction: float, kT: float) -> Callable[[MDState], MDState]:
    """One BAOAB Langevin step: B(half kick) A(half drift) O(thermostat)
    A(half drift) B(half kick with fresh forces)."""
    inv_m = (1.0 / masses)[:, None]
    c1 = float(np.exp(-friction * dt))
    c2 = float(np.sqrt(1.0 - c1 * c1))

    def step(state: MDState) -> MDState:
        v = state.velocities + 0.5 * dt * state.forces * inv_m
        x = state.positions + 0.5 * dt * v
        key, sub = jax.random.split(state.key)
        sigma = jnp.sqrt(kT * inv_m)
        v = c1 * v + c2 * sigma * jax.random.normal(sub, v.shape, v.dtype)
        x = x + 0.5 * dt * v
        energy, forces = force_fn(x)
        v = v + 0.5 * dt * forces * inv_m
        return MDState(x, v, forces, energy, key, state.step + 1)

    return step


def velocity_verlet(force_fn: ForceFn, masses: Array, dt: float) -> Callable[[MDState], MDState]:
    """One NVE velocity-Verlet step."""
    inv_m = (1.0 / masses)[:, None]

    def step(state: MDState) -> MDState:
        v_half = state.velocities + 0.5 * dt * state.forces * inv_m
        x = state.positions + dt * v_half
        energy, forces = force_fn(x)
        v = v_half + 0.5 * dt * forces * inv_m
        return MDState(x, v, forces, energy, state.key, state.step + 1)

    return step


class OverflowStats(NamedTuple):
    """Maximum TRUE capacity counts observed over a sticky-MD run — the
    production consumer of the soft-failure overflow contract
    (getNeighborPairs.py:77-83 / SURVEY §7.3 "check between scan segments").
    Compare against the static capacities on the host after each scanned
    call; any count above its capacity means neighbors were silently dropped
    and the segment must be re-run with larger capacities."""
    max_neighbors: Array        # [] int32, vs CellList.capacity
    max_cell_occupancy: Array   # [] int32, vs CellList.cell_capacity
    max_extra: Array            # [] int32, from overflow_fn (e.g. angular)

    def check(self, capacity: int, cell_capacity: int,
              extra_capacity: Optional[int] = None) -> None:
        bad = {}
        if int(self.max_neighbors) > capacity:
            bad['max_neighbors'] = (int(self.max_neighbors), capacity)
        if int(self.max_cell_occupancy) > cell_capacity:
            bad['max_cell_occupancy'] = (int(self.max_cell_occupancy),
                                         cell_capacity)
        if extra_capacity is not None and int(self.max_extra) > extra_capacity:
            bad['max_extra'] = (int(self.max_extra), extra_capacity)
        if bad:
            raise RuntimeError(
                f'neighbor capacity overflow during MD (true > capacity): {bad}')


def run_md_sticky(select_fn: Callable, force_fn_of_sel: Callable,
                  integrator_factory: Callable, state: MDState,
                  num_steps: int, refresh_every: int,
                  overflow_fn: Optional[Callable] = None):
    """Slot-sticky (Verlet-list) MD: refresh the neighbor selection every
    ``refresh_every`` steps, reuse it in between.

    The expensive discrete phase (cell assignment, sorting, compaction —
    ``CellList.select``) runs once per block; each step only re-scatters
    positions into the frozen slots (``payload_from_selection``). Valid while
    no atom moves more than skin/2 per block — build the CellList with
    ``cutoff + skin``.

    Args:
      select_fn: positions -> selection (e.g. ``cell_list.select(p, box)``).
      force_fn_of_sel: (selection, positions) -> (energy, forces).
      integrator_factory: force_fn -> one-step function (e.g.
        ``lambda ff: langevin_baoab(ff, masses, dt, friction, kT)``).
      state: initial MDState.
      num_steps: total steps (a multiple of refresh_every).
      refresh_every: steps per selection refresh.
      overflow_fn: optional (selection, positions) -> int32 extra true-count
        to track (e.g. the angular neighbor count,
        ``ops.aev.max_angular_neighbors``); recorded in ``stats.max_extra``.

    Returns: (final_state, per-block energies, OverflowStats). Call
    ``stats.check(capacity, cell_capacity)`` on the host after the scan.
    """
    def block(carry, _):
        state, stats = carry
        sel = select_fn(state.positions)
        stats = OverflowStats(
            jnp.maximum(stats.max_neighbors, sel.max_neighbors),
            jnp.maximum(stats.max_cell_occupancy, sel.max_cell_occupancy),
            jnp.maximum(stats.max_extra,
                        overflow_fn(sel, state.positions) if overflow_fn
                        else jnp.zeros((), jnp.int32)))
        force_fn = lambda pos: force_fn_of_sel(sel, pos)
        step = integrator_factory(force_fn)
        energy, forces = force_fn(state.positions)
        state = state._replace(energy=energy, forces=forces)
        state = jax.lax.fori_loop(0, refresh_every, lambda _, s: step(s), state)
        return (state, stats), state.energy

    num_blocks = num_steps // refresh_every
    zero = jnp.zeros((), jnp.int32)
    init = (state, OverflowStats(zero, zero, zero))
    (final, stats), energies = jax.lax.scan(block, init, None,
                                            length=num_blocks)
    return final, energies, stats


def run_md_sticky_counts(select_fn: Callable, force_fn_of_sel: Callable,
                         integrator_factory: Callable, state: MDState,
                         num_steps: int, refresh_every: int,
                         counts_fn: Callable):
    """Slot-sticky MD for ANY selection type (window/blocked/cluster/
    combined): like :func:`run_md_sticky`, but overflow tracking is a
    caller-supplied ``counts_fn(sel, positions) -> dict`` of true capacity
    counts (e.g. ``ANIModel.overflow_counts`` / ``ANIWithPME.
    overflow_counts`` with ``sel`` passed through). The returned stats dict
    holds the elementwise MAX of every count over all refresh blocks —
    compare against the static capacities on the host after the scan
    (the getNeighborPairs.py:77-83 soft-failure contract).

    Returns (final_state, per-block energies, stats_dict).
    """
    def block(carry, _):
        state, stats = carry
        sel = select_fn(state.positions)
        new = counts_fn(sel, state.positions)
        stats = {k: jnp.maximum(stats[k], jnp.asarray(new[k]))
                 for k in stats}
        force_fn = lambda pos: force_fn_of_sel(sel, pos)
        step = integrator_factory(force_fn)
        energy, forces = force_fn(state.positions)
        state = state._replace(energy=energy, forces=forces)
        state = jax.lax.fori_loop(0, refresh_every, lambda _, s: step(s),
                                  state)
        return (state, stats), state.energy

    sel0 = select_fn(state.positions)
    init_stats = {k: jnp.zeros_like(jnp.asarray(v))
                  for k, v in counts_fn(sel0, state.positions).items()}
    num_blocks = num_steps // refresh_every
    (final, stats), energies = jax.lax.scan(block, (state, init_stats), None,
                                            length=num_blocks)
    return final, energies, stats


def kinetic_energy(state: MDState, masses: Array) -> Array:
    return 0.5 * jnp.sum(masses[:, None] * state.velocities ** 2)


def run_md(step_fn: Callable[[MDState], MDState], state: MDState,
           num_steps: int, record_every: int = 1):
    """Run ``num_steps`` under one ``lax.scan``; returns (final_state,
    energies) where energies[k] is the potential energy at recorded steps.

    One compile serves any trajectory length that is a multiple of
    ``record_every`` blocks — the static-shape analog of the reference's
    CUDA-graph replay contract.
    """
    def block(state, _):
        state = jax.lax.fori_loop(0, record_every, lambda _, s: step_fn(s), state)
        return state, state.energy

    num_blocks = num_steps // record_every
    final, energies = jax.lax.scan(block, state, None, length=num_blocks)
    return final, energies
