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
* **TP** — :func:`tp_ensemble_energy` shards the layer-0 contraction over
  the 1008-long AEV axis across devices with a psum allreduce (the only
  contraction in the workload large enough to split profitably).
* **PP** — :func:`pipeline_ensemble_energy` streams microbatches of atoms
  through layer-per-device stages with ``ppermute`` handoffs. ANI's 4-layer
  MLPs are too shallow for PP to pay off in production (EP x DP is the
  efficient layout); the implementation demonstrates that true pipelining
  composes with the framework.
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


def tp_ensemble_energy(model: ANIModel, mesh: Mesh, axis: str = 'mp') -> Callable:
    """Tensor-parallel ensemble evaluation — EVERY layer sharded.

    Layer 0 (the only large contraction in the workload, 1008-wide) shards
    over the AEV (contraction) axis: each device multiplies its slice of W0
    against its slice of the features and one psum reconstructs the
    activations. Layers 1+ then shard over the MODEL axis (their per-model
    contractions are tiny, so splitting the batched model dim is the only
    profitable split); a final scalar psum combines the per-device partial
    energies. Two collectives total per call.

    Returns ``fn(params, aev) -> energy``. The AEV length and the ensemble
    size must both divide the axis size.
    """
    shard_map = jax.shard_map
    axis_size = mesh.shape[axis]
    aev_len = model.basis.aev_length
    if aev_len % axis_size:
        raise ValueError(f'axis size {axis_size} must divide aev length {aev_len}')
    grouping = model.grouping
    from ..ops.batched_nn import celu

    def fn(params: ANIParams, aev: Array) -> Array:
        def shard_fn(params, aev_slice):
            # aev_slice: [N, aev_len / axis_size]; W0 slice on the
            # contraction dim. Compute partial layer-0 products and psum.
            total = jnp.zeros((), aev_slice.dtype)
            idx = jax.lax.axis_index(axis)
            gathered = aev_slice[jnp.asarray(grouping.order)]
            start = 0
            for s, count in enumerate(grouping.counts):
                if count == 0:
                    continue
                net = params.ensemble.networks[s]
                block = jax.lax.slice_in_dim(gathered, start, start + count, axis=0)
                m, out0, in0 = net.weights[0].shape
                # Model-axis sharding of the tail needs axis_size | m;
                # otherwise the tail runs replicated (correct, just not
                # split — e.g. an 8-way TP axis over a 4-model ensemble).
                sharded_tail = m % axis_size == 0
                m_loc = m // axis_size if sharded_tail else m
                m_start = idx * m_loc if sharded_tail else 0
                # psum at the end sums every device's partial; a replicated
                # tail contributes axis_size identical copies.
                divisor = m if sharded_tail else m * axis_size
                w0_slice = jax.lax.dynamic_slice_in_dim(
                    net.weights[0], idx * (in0 // axis_size),
                    in0 // axis_size, axis=2)
                w0_mat = w0_slice.transpose(2, 0, 1).reshape(-1, m * out0)
                partial = jnp.dot(block, w0_mat,
                                  preferred_element_type=jnp.float32)
                h = jax.lax.psum(partial, axis)           # TP allreduce
                h = h.reshape(block.shape[0], m, out0) + net.biases[0]
                h = celu(h)
                # Layers 1+: model-axis sharding — this device keeps models
                # [m_start, m_start + m_loc) and the tail runs local-only.
                h = jnp.moveaxis(h, 0, 1)                 # [m, n, out0]
                h = jax.lax.dynamic_slice_in_dim(h, m_start, m_loc, 0)
                num_layers = len(net.weights)
                for layer in range(1, num_layers):
                    w = jax.lax.dynamic_slice_in_dim(
                        net.weights[layer], m_start, m_loc, 0)
                    b = jax.lax.dynamic_slice_in_dim(
                        net.biases[layer], m_start, m_loc, 0)
                    h = jax.lax.dot_general(h, w, (((2,), (2,)), ((0,), (0,))),
                                            preferred_element_type=jnp.float32)
                    h = h + b[:, None, :]
                    if layer < num_layers - 1:
                        h = celu(h)
                total = total + jnp.sum(h[:, :, 0]) / divisor
                start += count
            return jax.lax.psum(total, axis)

        in_specs = (P(), P(None, axis))
        return shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                         out_specs=P())(params, aev)

    return fn


def pipeline_ani_ensemble_energy(model: ANIModel, mesh: Mesh,
                                 axis: str = 'mp') -> Callable:
    """TRUE pipeline-parallel evaluation of the real ANI ensemble: layer i
    of the per-species CELU atomic networks runs on device i of ``axis``
    (stages == network depth), with species-homogeneous microbatches of
    atoms streaming through ``ppermute`` handoffs (1F pipeline, bubble =
    stages-1).

    Heterogeneity is handled without cross-layer weight padding: every
    stage's computation is a ``lax.switch`` over (layer == axis_index,
    species of the in-flight microbatch); activations ride a buffer padded
    to the widest hidden layer. Weights stay replicated — PP here places
    COMPUTE, which is the part that matters for a shallow-MLP workload.

    Returns ``fn(params, aev) -> total NN energy`` (no SAE term), equal to
    :func:`nnpops_tpu.ops.batched_nn.ensemble_energy`.
    """
    shard_map = jax.shard_map
    stages = mesh.shape[axis]
    grouping = model.grouping
    from ..ops.batched_nn import celu

    present = [s for s, c in enumerate(grouping.counts) if c > 0]
    counts = [grouping.counts[s] for s in present]
    mb = max(counts)
    num_mb = len(present)

    def fn(params: ANIParams, aev: Array) -> Array:
        nets = params.ensemble.networks
        num_layers = len(nets[present[0]].weights)
        if num_layers != stages:
            raise ValueError(f'pipeline needs axis size == network depth '
                             f'({stages} != {num_layers})')
        m = nets[present[0]].weights[0].shape[0]
        h_max = max(max(w.shape[1] for w in nets[s].weights)
                    for s in present)

        gathered = aev[jnp.asarray(grouping.order)]
        blocks, masks = [], []
        start = 0
        for c in counts:
            blk = jax.lax.slice_in_dim(gathered, start, start + c, axis=0)
            blocks.append(jnp.pad(blk, ((0, mb - c), (0, 0))))
            masks.append((jnp.arange(mb) < c).astype(aev.dtype))
            start += c
        x_mb = jnp.stack(blocks)               # [T, mb, F]
        mask_mb = jnp.stack(masks)             # [T, mb]

        def shard_fn(params_r, x_all, mask_all):
            idx = jax.lax.axis_index(axis)
            nets_r = params_r.ensemble.networks

            def make_branch(layer, sp):
                net = nets_r[sp]
                w, b = net.weights[layer], net.biases[layer]
                o, i = w.shape[1], w.shape[2]

                def branch(x_in, buf):
                    if layer == 0:
                        w0 = w.transpose(2, 0, 1).reshape(i, m * o)
                        h = jnp.dot(x_in, w0,
                                    preferred_element_type=jnp.float32)
                        h = jnp.moveaxis(h.reshape(mb, m, o), 0, 1)
                    else:
                        h = jax.lax.dot_general(
                            buf[:, :, :i], w, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                    h = h + b[:, None, :]
                    if layer < num_layers - 1:
                        h = celu(h)
                    out = jnp.zeros((m, mb, h_max), h.dtype)
                    return jax.lax.dynamic_update_slice(out, h, (0, 0, 0))

                return branch

            branches = [make_branch(layer, sp)
                        for layer in range(stages) for sp in present]

            def tick(carry, t):
                buf, acc = carry
                mb_id = t - idx          # microbatch this stage works on
                mb_c = jnp.clip(mb_id, 0, num_mb - 1)
                x_in = x_all[mb_c]
                branch_id = idx * num_mb + mb_c
                newbuf = jax.lax.switch(branch_id, branches, x_in, buf)
                active = (mb_id >= 0) & (mb_id < num_mb)
                newbuf = jnp.where(active, newbuf, jnp.zeros_like(newbuf))
                e_mb = jnp.sum(jnp.mean(newbuf[:, :, 0], axis=0)
                               * mask_all[mb_c])
                acc = acc + jnp.where(active & (idx == stages - 1), e_mb, 0.0)
                nxt = jax.lax.ppermute(newbuf, axis,
                                       [(i, (i + 1) % stages)
                                        for i in range(stages)])
                return (nxt, acc), None

            buf0 = jax.lax.pcast(jnp.zeros((m, mb, h_max), x_all.dtype),
                                 (axis,), to='varying')
            acc0 = jax.lax.pcast(jnp.zeros((), x_all.dtype), (axis,),
                                 to='varying')
            (_, acc), _ = jax.lax.scan(tick, (buf0, acc0),
                                       jnp.arange(num_mb + stages - 1))
            return jax.lax.psum(acc, axis)

        return shard_map(shard_fn, mesh=mesh, in_specs=(P(), P(), P()),
                         out_specs=P())(params, x_mb, mask_mb)

    return fn


def pipeline_ensemble_energy(layer_dims: Tuple[int, ...], mesh: Mesh,
                             axis: str = 'mp',
                             num_microbatches: int = 4) -> Callable:
    """Pipeline-parallel MLP evaluation (PP): layer i lives on device i of
    ``axis``; microbatches of atoms stream through the stages with
    ``ppermute`` handoffs (the classic 1F pipeline, bubble = stages-1).

    Built for a homogeneous stack (one hidden width) to keep stage weights
    stackable — a demonstration that true PP composes with this framework,
    not the production path (ANI's 4-layer MLPs are too shallow to benefit;
    see module docstring).

    Returns ``fn(stage_weights [S, W, W], stage_biases [S, W], x [N, W]) ->
    per-atom outputs [N, W]`` where S == axis size and N divides
    num_microbatches.
    """
    shard_map = jax.shard_map

    def fn(stage_w: Array, stage_b: Array, x: Array) -> Array:
        stages = mesh.shape[axis]

        def shard_fn(w, b, x_all):
            # w: [1, W, W] this stage's weights; x_all: [N, W] replicated.
            w = w[0]
            b = b[0]
            idx = jax.lax.axis_index(axis)
            n = x_all.shape[0]
            if n % num_microbatches:
                raise ValueError(f'num atoms {n} must be divisible by '
                                 f'num_microbatches {num_microbatches}')
            mb = n // num_microbatches
            x_mb = x_all.reshape(num_microbatches, mb, -1)

            def tick(carry, t):
                buf, out = carry
                # Stage 0 injects microbatch t; others use the handoff buffer.
                inject = jax.lax.dynamic_index_in_dim(
                    x_mb, jnp.clip(t, 0, num_microbatches - 1), 0,
                    keepdims=False)
                current = jnp.where(idx == 0, inject, buf)
                y = jax.nn.relu(jnp.dot(current, w,
                                        preferred_element_type=jnp.float32) + b)
                # Hand off to the next stage; the last stage's output is
                # collected for the microbatch that has passed all stages.
                nxt = jax.lax.ppermute(y, axis,
                                       [(i, (i + 1) % stages)
                                        for i in range(stages)])
                done_t = t - (stages - 1)
                updated = jax.lax.dynamic_update_index_in_dim(
                    out, y, jnp.clip(done_t, 0, num_microbatches - 1), 0)
                keep = (done_t >= 0) & (idx == stages - 1)
                out = jnp.where(keep, updated, out)
                return (nxt, out), None

            buf0 = jax.lax.pcast(jnp.zeros((mb, x_all.shape[1]), x_all.dtype),
                                 (axis,), to='varying')
            out0 = jax.lax.pcast(jnp.zeros_like(x_mb), (axis,),
                                 to='varying')
            (_, out), _ = jax.lax.scan(tick, (buf0, out0),
                                       jnp.arange(num_microbatches + stages - 1))
            # Only the last stage holds real outputs; broadcast via psum.
            out = jnp.where(idx == stages - 1, out, 0.0)
            out = jax.lax.psum(out, axis)
            return out.reshape(n, -1)

        return shard_map(shard_fn, mesh=mesh,
                         in_specs=(P(axis), P(axis), P()),
                         out_specs=P())(stage_w, stage_b, x)

    return fn


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
