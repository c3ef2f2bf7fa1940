"""The composite ANI model (the ``OptimizedTorchANI`` equivalent).

Reproduces the four-stage pipeline of the reference
(OptimizedTorchANI.py:45-52): species conversion -> AEV featurization ->
atomic-network ensemble -> self-energy shift — but as one pure function that
jits into a single XLA program, with forces from ``jax.grad`` on positions
instead of a backward pass through op boundaries.

Stateless by design: the Holder pattern's lazy device binding and cached
output tensors (SymmetryFunctions.cpp:104-146) do not exist here; parameters
are a pytree, positions go in, energy comes out.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ANI2X_ELEMENTS, ANI2X_LAYER_DIMS, ANIBasis
from ..ops.aev import aev_forward
from ..ops.batched_nn import (EnsembleParams, SpeciesGrouping, build_grouping,
                              ensemble_energy, init_ensemble)

Array = jnp.ndarray


def species_from_atomic_numbers(atomic_numbers, elements: Sequence[int] = ANI2X_ELEMENTS) -> np.ndarray:
    """Atomic numbers -> dense species indices.

    The SpeciesConverter equivalent (SpeciesConverter.py:33-34): the lookup is
    precomputed once at model build, never per step. Raises on unsupported
    elements (index -1 in the torchani convention).
    """
    table = -np.ones(int(max(elements)) + 1, dtype=np.int32)
    for i, z in enumerate(elements):
        table[z] = i
    z = np.asarray(atomic_numbers, dtype=np.int64)
    if (z < 0).any() or (z >= len(table)).any() or (table[z] < 0).any():
        raise ValueError(f'unsupported atomic numbers for elements {tuple(elements)}')
    return table[z].astype(np.int32)


class ANIParams(NamedTuple):
    """Learnable/loadable parameters of an ANI model (a pure pytree)."""
    ensemble: EnsembleParams
    self_energies: Array   # [num_species] per-species SAE values


def init_ani_params(key, basis: ANIBasis,
                    layer_dims: Sequence[Sequence[int]] = ANI2X_LAYER_DIMS,
                    num_models: int = 8,
                    self_energies: Optional[np.ndarray] = None) -> ANIParams:
    ens = init_ensemble(key, basis.aev_length, layer_dims, num_models)
    if self_energies is None:
        sae = jnp.zeros((basis.num_species,), jnp.float32)
    else:
        sae = jnp.asarray(self_energies, jnp.float32)
    return ANIParams(ens, sae)


@dataclasses.dataclass(frozen=True)
class ANIModel:
    """A system-bound ANI model: basis + static species assignment.

    Build once per chemical system (species never change during MD); the
    instance precomputes the species grouping used by the MXU matmul path and
    the SAE gather, then exposes pure ``energy`` / ``energy_and_forces``
    functions of (params, positions).
    """
    basis: ANIBasis
    species: Tuple[int, ...]                 # static species indices
    angular_capacity: Optional[int] = None
    # Process the AEV in atom blocks of this size (bounds the angular
    # intermediates' memory at large N; see compute_aev_from_payload).
    aev_chunk_size: Optional[int] = None
    # Opt-in bf16 for the AEV species-scatter contractions (f32 accumulate):
    # ~2x the dominant traffic/MXU rate at ~2e-3 relative force error —
    # inside the reference's 5e-3 force gate but outside its 5e-7 energy
    # gate, hence opt-in.
    aev_bf16: bool = False

    @classmethod
    def from_atomic_numbers(cls, atomic_numbers, basis: Optional[ANIBasis] = None,
                            elements: Sequence[int] = ANI2X_ELEMENTS,
                            angular_capacity: Optional[int] = None,
                            aev_chunk_size: Optional[int] = None,
                            aev_bf16: bool = False) -> 'ANIModel':
        basis = basis if basis is not None else ANIBasis.ani2x()
        sp = species_from_atomic_numbers(atomic_numbers, elements)
        return cls(basis=basis, species=tuple(int(s) for s in sp),
                   angular_capacity=angular_capacity,
                   aev_chunk_size=aev_chunk_size, aev_bf16=aev_bf16)

    @property
    def num_atoms(self) -> int:
        return len(self.species)

    @property
    def species_array(self) -> np.ndarray:
        return np.asarray(self.species, dtype=np.int32)

    @property
    def grouping(self) -> SpeciesGrouping:
        return build_grouping(self.species_array, self.basis.num_species)

    def aev(self, positions: Array, box: Optional[Array] = None,
            neighbors: Optional[Array] = None) -> Array:
        return aev_forward(positions, jnp.asarray(self.species_array), self.basis,
                           box=box, neighbors=neighbors,
                           angular_capacity=self.angular_capacity)

    def energy(self, params: ANIParams, positions: Array,
               box: Optional[Array] = None,
               neighbors: Optional[Array] = None) -> Array:
        """Total potential energy (NN ensemble mean + self-atomic energies,
        the EnergyShifter stage of EnergyShifter.py:45-52)."""
        feat = self.aev(positions, box, neighbors)
        e_nn = ensemble_energy(params.ensemble, feat, self.grouping)
        sae = jnp.sum(params.self_energies[jnp.asarray(self.species_array)])
        return e_nn + sae

    def energy_and_forces(self, params: ANIParams, positions: Array,
                          box: Optional[Array] = None,
                          neighbors: Optional[Array] = None) -> Tuple[Array, Array]:
        """Energy and forces = -dE/dpositions, one fused XLA program."""
        e, grad = jax.value_and_grad(self.energy, argnums=1)(params, positions, box, neighbors)
        return e, -grad

    # ---- Fused gather-free path (production MD): cell-list payload + AEV.

    @property
    def species_onehot(self) -> np.ndarray:
        eye = np.eye(self.basis.num_species, dtype=np.float32)
        return eye[self.species_array]

    def energy_fused(self, params: ANIParams, positions: Array, box: Array,
                     cell_list) -> Array:
        """Total energy via the payload-carrying neighbor pipeline: the cell
        list delivers per-neighbor deltas + species one-hots directly (no
        per-(atom, neighbor) gathers anywhere — see
        CellList.build_payload), then the gather-free AEV and the grouped
        ensemble run on top. ~10x faster per MD step on TPU than the
        index-based path at water-box scale."""
        from ..ops.aev import compute_aev_from_payload
        payload = cell_list.build_payload(positions, box,
                                          jnp.asarray(self.species_onehot))
        cap = self.angular_capacity or cell_list.capacity
        cdt = jnp.bfloat16 if self.aev_bf16 else None
        radial, angular = compute_aev_from_payload(payload, self.basis, cap,
                                                   self.aev_chunk_size, cdt)
        feat = jnp.concatenate([radial, angular], axis=1)
        e_nn = ensemble_energy(params.ensemble, feat, self.grouping)
        sae = jnp.sum(params.self_energies[jnp.asarray(self.species_array)])
        return e_nn + sae

    def energy_and_forces_fused(self, params: ANIParams, positions: Array,
                                box: Array, cell_list) -> Tuple[Array, Array]:
        e, grad = jax.value_and_grad(self.energy_fused, argnums=1)(
            params, positions, box, cell_list)
        return e, -grad

    def overflow_counts(self, positions: Array, box: Array, cell_list,
                        sel=None) -> dict:
        """TRUE capacity counts for every static bound in the fused pipeline,
        as data (jit-safe). Callers compare against the capacities between
        scan segments — the production-side consumer of the soft-failure
        contract (getNeighborPairs.py:77-83): any count above its capacity
        means contributions were silently dropped and the step must be
        re-planned with larger capacities.

        Returns dict with 'max_neighbors' (vs ``cell_list.capacity``),
        'max_cell_occupancy' (vs ``cell_list.cell_capacity``) and
        'max_angular' (vs ``angular_capacity``)."""
        from ..ops.aev import max_angular_neighbors
        if sel is not None:
            payload = cell_list.payload_from_selection(positions, box, sel)
        else:
            payload = cell_list.build_payload(positions, box)
        return {
            'max_neighbors': payload.max_neighbors,
            'max_cell_occupancy': payload.max_cell_occupancy,
            'max_angular': max_angular_neighbors(payload,
                                                 self.basis.angular_cutoff),
        }

    def check_overflow(self, positions: Array, box: Array, cell_list,
                       sel=None) -> None:
        """Host-side assertion that no static capacity overflowed (call
        outside jit, between scanned segments)."""
        counts = {k: int(v) for k, v in
                  self.overflow_counts(positions, box, cell_list, sel).items()}
        caps = {'max_neighbors': cell_list.capacity,
                'max_cell_occupancy': cell_list.cell_capacity,
                'max_angular': self.angular_capacity or cell_list.capacity}
        bad = {k: (counts[k], caps[k]) for k in counts if counts[k] > caps[k]}
        if bad:
            raise RuntimeError(
                f'neighbor capacity overflow (true count > capacity): {bad}; '
                'rebuild with larger capacities (nnpops_tpu.native.plan_capacities)')

    def energy_from_selection(self, params: ANIParams, positions: Array,
                              box: Array, cell_list, sel) -> Array:
        """Energy against a frozen neighbor selection (slot-sticky stepping):
        only the differentiable payload phase runs — build the cell list with
        cutoff + skin and refresh ``sel`` every few steps
        (md.run_md_sticky)."""
        from ..ops.aev import compute_aev_from_payload
        payload = cell_list.payload_from_selection(
            positions, box, sel, jnp.asarray(self.species_onehot))
        cap = self.angular_capacity or cell_list.capacity
        cdt = jnp.bfloat16 if self.aev_bf16 else None
        radial, angular = compute_aev_from_payload(payload, self.basis, cap,
                                                   self.aev_chunk_size, cdt)
        feat = jnp.concatenate([radial, angular], axis=1)
        e_nn = ensemble_energy(params.ensemble, feat, self.grouping)
        sae = jnp.sum(params.self_energies[jnp.asarray(self.species_array)])
        return e_nn + sae

    def energy_and_forces_from_selection(self, params: ANIParams,
                                         positions: Array, box: Array,
                                         cell_list, sel) -> Tuple[Array, Array]:
        e, grad = jax.value_and_grad(self.energy_from_selection, argnums=1)(
            params, positions, box, cell_list, sel)
        return e, -grad
