"""Multi-chip SPMD execution over a ``jax.sharding.Mesh``.

The reference has no distributed execution of any kind (SURVEY §2.3); this
layer is the designed-for-TPU extension: shard over ICI with XLA collectives
instead of translating anything.

How the classic parallelism axes map onto the NNP workload:

* **DP** — a batch of replicas/conformations, sharded over the ``dp`` mesh
  axis (leading dim of positions/targets in the training step).
* **EP** — the ANI ensemble: independent per-species "expert" models whose
  leading model axis shards over the ``mp`` mesh axis; the ensemble mean and
  parameter gradients become psums over ``mp`` (inserted by GSPMD). This is
  the genuine expert-parallel structure of the workload (SURVEY §2.3:
  BatchedNN's per-species expert MLPs).
* **SP** — the domain analog of sequence parallelism is the *atom axis*:
  :func:`atom_sharded_energy` shard_maps the AEV + atomic networks over
  blocks of center atoms (positions replicated — every block needs halo
  atoms anyway, and positions are tiny next to activations), with a ``psum``
  for the total energy; forces differentiate through the psum.
* **TP** — within each expert, the layer-0 contraction over the 1008-long
  AEV axis is left to GSPMD to shard along ``mp`` when profitable; a 4-layer
  MLP has no pipeline depth, so PP is deliberately not modeled (documented
  design decision — there is nothing to pipeline in this workload).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ani import ANIModel, ANIParams
from ..ops.aev import aev_forward
from ..ops.batched_nn import apply_species_net

Array = jnp.ndarray


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 2) -> Mesh:
    """A ('dp', 'mp') mesh over the first ``n_devices`` devices; ``mp``
    carries the ensemble (expert) axis, ``dp`` the batch axis."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    mp = max(1, min(model_parallel, n))
    while n % mp:
        mp -= 1
    return Mesh(devices.reshape(n // mp, mp), ('dp', 'mp'))


def ensemble_param_spec(params: ANIParams) -> ANIParams:
    """PartitionSpec pytree: every ensemble weight/bias shards its leading
    model (expert) axis over 'mp'; SAE values replicate."""
    ens_spec = jax.tree_util.tree_map(lambda _: P('mp'), params.ensemble)
    return ANIParams(ens_spec, P())


def shard_params(params: ANIParams, mesh: Mesh) -> ANIParams:
    """Place parameters on the mesh with the EP layout."""
    spec = ensemble_param_spec(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec,
        is_leaf=lambda x: isinstance(x, P))


class TrainState(NamedTuple):
    params: ANIParams
    opt_state: Any


def make_train_step(model: ANIModel, optimizer,
                    force_weight: float = 0.0) -> Callable:
    """The SPMD training step: energy-matching MSE loss (optionally +
    force matching, which differentiates *through* the force computation —
    second-order AD, impossible in the reference by design,
    BatchedNN.cpp:36-41 / pme.py:36-38).

    Returns ``step(state, positions[B,N,3], e_target[B], f_target[B,N,3])``.
    """
    def loss_fn(params, positions, e_target, f_target):
        def single(pos, et, ft):
            if force_weight > 0.0:
                e, f = model.energy_and_forces(params, pos)
                return (e - et) ** 2 + force_weight * jnp.mean((f - ft) ** 2)
            return (model.energy(params, pos) - et) ** 2
        return jnp.mean(jax.vmap(single)(positions, e_target, f_target))

    def step(state: TrainState, positions, e_target, f_target):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, positions,
                                                  e_target, f_target)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss

    return step


def init_train_state(model: ANIModel, optimizer, params: ANIParams,
                     mesh: Mesh) -> TrainState:
    sharded = shard_params(params, mesh)
    return TrainState(sharded, optimizer.init(sharded))


def shard_batch(mesh: Mesh, *arrays: Array) -> Tuple[Array, ...]:
    """Place batch arrays with their leading dim sharded over 'dp'."""
    data = NamedSharding(mesh, P('dp'))
    return tuple(jax.device_put(a, data) for a in arrays)


def jit_train_step(model: ANIModel, optimizer, mesh: Mesh,
                   force_weight: float = 0.0) -> Callable:
    """jit the train step. Sharding flows from the argument placements
    (params EP over 'mp' via :func:`init_train_state`, batch DP over 'dp'
    via :func:`shard_batch`); GSPMD inserts the ensemble-mean and gradient
    psums."""
    return jax.jit(make_train_step(model, optimizer, force_weight))


def atom_sharded_energy(model: ANIModel, mesh: Mesh, axis: str = 'dp') -> Callable:
    """Atom-axis (SP) sharded energy via shard_map.

    Each device computes the AEV and atomic energies for its contiguous block
    of center atoms against replicated positions, using the ``centers`` hook
    of :func:`nnpops_tpu.ops.aev.compute_aev`; the total energy is a psum.
    The per-block species mix is data-dependent per device, so atomic
    energies use a masked per-species evaluation instead of the static
    grouping (correct for any block composition).

    Returns ``fn(params, positions) -> energy`` (differentiable; forces via
    ``jax.grad``). num_atoms must divide the axis size.
    """
    shard_map = jax.shard_map

    n = model.num_atoms
    axis_size = mesh.shape[axis]
    if n % axis_size:
        raise ValueError(f'num_atoms {n} must divide mesh axis size {axis_size}')
    block = n // axis_size
    species = jnp.asarray(model.species_array)
    basis = model.basis

    def block_fn(params: ANIParams, positions: Array) -> Array:
        idx = jax.lax.axis_index(axis)
        start = idx * block
        centers = start + jnp.arange(block, dtype=jnp.int32)
        feat = aev_forward(positions, species, basis, centers=centers,
                           angular_capacity=model.angular_capacity)
        sp = jax.lax.dynamic_slice_in_dim(species, start, block)
        total = jnp.zeros((), feat.dtype)
        for s, net in enumerate(params.ensemble.networks):
            e_s = jnp.mean(apply_species_net(net, feat), axis=-1)   # [block]
            total = total + jnp.sum(jnp.where(sp == s, e_s, 0.0))
        total = total + jnp.sum(params.self_energies[sp])
        return jax.lax.psum(total, axis)

    def fn(params: ANIParams, positions: Array) -> Array:
        return shard_map(block_fn, mesh=mesh,
                         in_specs=(P(), P()), out_specs=P())(params, positions)

    return fn
