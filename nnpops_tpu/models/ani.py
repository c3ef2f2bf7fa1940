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
    # AEV implementation for the cell-list paths: 'payload' (round-1 one-hot
    # contraction pipeline) or 'blocked' (species-blocked static slots — no
    # one-hots, frozen angular sub-list; see neighbors/blocked.py).
    aev_impl: str = 'payload'
    # Static per-species lane layout (required for aev_impl='blocked').
    blocked_layout: Optional['BlockedLayout'] = None
    # Matmul compute dtype for the atomic-network ensemble: None (f32) or
    # 'bfloat16' (2x MXU rate, f32 accumulation; ~1e-3 relative force error —
    # inside the reference's 5e-3 force gate, outside its 5e-7 energy gate).
    nn_dtype: Optional[str] = None
    # Ensemble implementation for the grouped-row paths: 'xla' (full weight
    # gradients, training-capable) or 'fused' (Pallas kernel, weights
    # VMEM-resident, bf16 matmuls — inference + position gradients only,
    # the reference BatchedNN's exact scope, BatchedNN.cpp:36-41).
    nn_impl: str = 'xla'
    # Radial kernel for aev_impl='window': 'window' (directed 27-cell
    # window kernel; honors cell-occupancy bucketing) or 'pair' (symmetric
    # cell-pair kernel — each pair's Gaussian ladder evaluated once, but
    # MEASURED SLOWER on v5e: its [c, 3c] pair blocks are too narrow to
    # amortize VPU instruction overhead and pay misaligned-lane reductions;
    # see NOTES_PERF round-2 session 6. Kept as a correctness-tested
    # alternate for future hardware).
    window_radial: str = 'window'

    @classmethod
    def from_atomic_numbers(cls, atomic_numbers, basis: Optional[ANIBasis] = None,
                            elements: Sequence[int] = ANI2X_ELEMENTS,
                            angular_capacity: Optional[int] = None,
                            aev_chunk_size: Optional[int] = None,
                            aev_bf16: bool = False,
                            aev_impl: str = 'payload',
                            blocked_layout=None,
                            nn_dtype: Optional[str] = None,
                            nn_impl: str = 'xla') -> 'ANIModel':
        basis = basis if basis is not None else ANIBasis.ani2x()
        sp = species_from_atomic_numbers(atomic_numbers, elements)
        return cls(basis=basis, species=tuple(int(s) for s in sp),
                   angular_capacity=angular_capacity,
                   aev_chunk_size=aev_chunk_size, aev_bf16=aev_bf16,
                   aev_impl=aev_impl, blocked_layout=blocked_layout,
                   nn_dtype=nn_dtype, nn_impl=nn_impl)

    def with_blocked_layout(self, positions, box, margin: float = 1.2,
                            lane_multiple: int = 1,
                            impl: str = 'blocked',
                            skin: float = 0.0,
                            radial_impl: Optional[str] = None) -> 'ANIModel':
        """Return a copy configured for the species-blocked AEV path, with
        per-species capacities planned from this configuration (the blocked
        analog of native.plan_capacities). ``impl``: 'blocked' (XLA),
        'pallas' (fused VMEM kernel for the angular block), or 'window'
        (dense per-cell window radial kernel + compacted-lane Pallas
        angular — the fastest production path; needs a periodic cell
        decomposition and falls back to 'pallas' without one).
        ``skin``: Verlet skin the selection will run with (widens both
        capacity windows — the frozen lists must hold every pair that can
        enter the cutoff before the next refresh)."""
        from ..neighbors.blocked import plan_blocked_layout
        cell_grid = cell_caps = None
        if impl == 'window':
            lane_multiple = max(lane_multiple, 8)
            if box is None:
                impl = 'pallas'
            else:
                from ..neighbors.window import plan_window_cells
                present = tuple(int(s) for s in np.unique(self.species_array))
                (cell_grid, cell_caps, small_caps,
                 num_big) = plan_window_cells(
                    positions, box, self.species_array, present,
                    self.basis.radial_cutoff + skin, margin=margin)
                if cell_grid is None:
                    impl = 'pallas'   # no cell grid: window mode impossible
        layout = plan_blocked_layout(
            positions, box, self.species_array,
            self.basis.radial_cutoff + skin,
            self.basis.angular_cutoff + skin, self.basis.num_species,
            margin=margin, lane_multiple=lane_multiple)
        if cell_caps is not None:
            from ..neighbors.window import (plan_angular_tiers,
                                            plan_window_cells)
            ang_tier_caps, ang_tier_rows = plan_angular_tiers(
                positions, box, self.species_array, layout.present,
                self.basis.angular_cutoff + skin, layout.ang_caps)
            # Dedicated angular candidate grid (cells sized by the angular
            # window): the [N, 27c] select-time candidate tensor shrinks
            # ~(rc/ra)^3; skip it when it would not actually be smaller.
            present = tuple(int(s) for s in np.unique(self.species_array))
            (ang_grid, ang_ccaps, _, _) = plan_window_cells(
                positions, box, self.species_array, present,
                self.basis.angular_cutoff + skin, margin=margin,
                pad_multiple=1)
            if (ang_grid is None
                    or np.prod(ang_grid) <= np.prod(cell_grid)):
                ang_grid = ang_ccaps = None
            layout = dataclasses.replace(layout, cell_caps=cell_caps,
                                         cell_grid=cell_grid,
                                         small_caps=small_caps,
                                         num_big_cells=num_big,
                                         ang_tier_caps=ang_tier_caps,
                                         ang_tier_rows=ang_tier_rows,
                                         ang_cell_caps=ang_ccaps,
                                         ang_cell_grid=ang_grid)
        window_radial = self.window_radial
        if impl == 'window' and radial_impl is not None:
            if radial_impl == 'cluster':
                from ..neighbors.clusters import plan_clusters
                plan = plan_clusters(positions, box, self.species_array,
                                     self.basis.radial_cutoff, skin=skin,
                                     margin=margin)
                if plan is None:
                    radial_impl = 'window'   # unsuitable box: keep window
                else:
                    layout = dataclasses.replace(layout, cluster_plan=plan)
            window_radial = radial_impl
        return dataclasses.replace(self, aev_impl=impl,
                                   blocked_layout=layout,
                                   window_radial=window_radial)

    def create_cell_list(self, box, skin: float = 0.0):
        """The matching CellList for this model's planned layout: window
        mode needs the cell capacity to equal the planned species-sub-block
        total (select_window verifies)."""
        from ..neighbors.cell_list import CellList
        cell_capacity = None
        if self.aev_impl == 'window' and self.blocked_layout.cell_caps:
            cell_capacity = sum(self.blocked_layout.cell_caps)
        return CellList.create(box, self.basis.radial_cutoff + skin,
                               capacity=self.blocked_layout.rad_total,
                               cell_capacity=cell_capacity)

    @property
    def num_atoms(self) -> int:
        return len(self.species)

    @property
    def species_array(self) -> np.ndarray:
        return np.asarray(self.species, dtype=np.int32)

    @property
    def nn_compute_dtype(self):
        # Accept both the config string and a dtype object (several callers
        # pass jnp.bfloat16 directly).
        if self.nn_dtype == 'bfloat16' or self.nn_dtype is jnp.bfloat16:
            return jnp.bfloat16
        return None

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
        e_nn = ensemble_energy(params.ensemble, feat, self.grouping,
                                self.nn_compute_dtype)
        sae = jnp.sum(params.self_energies[jnp.asarray(self.species_array)])
        return e_nn + sae

    def energy_and_forces(self, params: ANIParams, positions: Array,
                          box: Optional[Array] = None,
                          neighbors: Optional[Array] = None) -> Tuple[Array, Array]:
        """Energy and forces = -dE/dpositions, one fused XLA program."""
        e, grad = jax.value_and_grad(self.energy, argnums=1)(params, positions, box, neighbors)
        return e, -grad

    def energy_batch(self, params: ANIParams, positions: Array,
                     box: Optional[Array] = None) -> Array:
        """Conformer-batch energies: ``positions [M, N, 3] -> [M]``.

        The molecule-batch dimension the reference carries through BatchedNN
        (``[num_mols, ...]``, BatchedNN.py:94-109) but rejects at the AEV
        stage (``species.shape[0] != 1`` raises, SymmetryFunctions.py:110-111)
        — here the dense AEV+ensemble pipeline vmaps over conformers of this
        model's (static) composition, so batching works end to end.
        """
        return jax.vmap(lambda p: self.energy(params, p, box))(positions)

    def energy_and_forces_batch(self, params: ANIParams, positions: Array,
                                box: Optional[Array] = None
                                ) -> Tuple[Array, Array]:
        """Batched energies [M] and forces [M, N, 3] (see energy_batch)."""
        def one(p):
            e, g = jax.value_and_grad(self.energy, argnums=1)(params, p, box)
            return e, -g
        return jax.vmap(one)(positions)

    # ---- Fused gather-free path (production MD): cell-list payload + AEV.

    @property
    def species_onehot(self) -> np.ndarray:
        eye = np.eye(self.basis.num_species, dtype=np.float32)
        return eye[self.species_array]

    def select(self, positions: Array, box: Array, cell_list):
        """Freeze a neighbor selection for sticky (Verlet-skin) stepping —
        the type matches ``aev_impl`` ('payload' -> SlotSelection,
        'blocked'/'pallas' -> BlockedSelection, 'window' ->
        WindowSelection)."""
        if self.aev_impl == 'window':
            from ..neighbors.window import select_window
            g = self.grouping
            present_counts = tuple(g.counts[s]
                                   for s in self.blocked_layout.present)
            return select_window(cell_list, positions, box,
                                 self.species_array, self.blocked_layout,
                                 self.basis.radial_cutoff,
                                 self.basis.angular_cutoff,
                                 grouping_order=np.asarray(g.order),
                                 present_counts=present_counts,
                                 need_shift_planes=(self.window_radial
                                                    == 'window'),
                                 cluster_plan=(
                                     self.blocked_layout.cluster_plan
                                     if self.window_radial == 'cluster'
                                     else None))
        if self.aev_impl in ('blocked', 'pallas'):
            from ..neighbors.blocked import select_blocked
            return select_blocked(cell_list, positions, box,
                                  self.species_array, self.blocked_layout,
                                  self.basis.radial_cutoff,
                                  self.basis.angular_cutoff)
        return cell_list.select(positions, box)

    def energy_fused(self, params: ANIParams, positions: Array, box: Array,
                     cell_list) -> Array:
        """Total energy via the payload-carrying neighbor pipeline: the cell
        list delivers per-neighbor deltas + species one-hots directly (no
        per-(atom, neighbor) gathers anywhere — see
        CellList.build_payload), then the gather-free AEV and the grouped
        ensemble run on top. ~10x faster per MD step on TPU than the
        index-based path at water-box scale."""
        if self.aev_impl in ('blocked', 'pallas', 'window'):
            return self.energy_from_selection(
                params, positions, box, cell_list,
                self.select(positions, box, cell_list))
        from ..ops.aev import compute_aev_from_payload
        payload = cell_list.build_payload(positions, box,
                                          jnp.asarray(self.species_onehot))
        cap = self.angular_capacity or cell_list.capacity
        cdt = jnp.bfloat16 if self.aev_bf16 else None
        radial, angular = compute_aev_from_payload(payload, self.basis, cap,
                                                   self.aev_chunk_size, cdt)
        feat = jnp.concatenate([radial, angular], axis=1)
        e_nn = ensemble_energy(params.ensemble, feat, self.grouping,
                                self.nn_compute_dtype)
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
        'max_angular' (vs ``angular_capacity``). On the blocked path the
        neighbor/angular entries are per-present-species arrays instead."""
        if self.aev_impl == 'window':
            wsel = (sel if sel is not None
                    else self.select(positions, box, cell_list))
            # Window radial is capacity-free; the remaining capacities are
            # the per-(cell, species) occupancy and the angular lane caps.
            counts = {'max_neighbors': wsel.ang.max_rad,
                      'max_cell_occupancy': wsel.max_cell_sp,
                      'max_angular': wsel.ang.max_ang}
            if self.blocked_layout.ang_cell_grid is not None:
                counts['max_cell_occupancy_ang'] = wsel.max_cell_sp_ang
            if self.blocked_layout.num_big_cells is not None:
                counts['num_big_cells'] = wsel.n_big_true
            if wsel.tier is not None:
                # Cumulative per-tier row counts vs cumulative planned
                # capacities (a tier-t row pushed past its tier's slice
                # would run with too-small lane caps).
                counts['ang_tier_rows'] = wsel.tier.tier_counts
            if wsel.clusters is not None:
                # Cluster-radial soft failures (see ClusterSelection): the
                # boolean geometric bound rides along as a 0/1 count.
                counts['cluster_jcount'] = wsel.clusters.max_jcount
                counts['cluster_cand'] = wsel.clusters.max_cand
                counts['cluster_mirror'] = wsel.clusters.max_mir
                counts['cluster_geom'] = wsel.clusters.geom_violation.astype(
                    jnp.int32)
            return counts
        if self.aev_impl in ('blocked', 'pallas'):
            bsel = (sel if sel is not None
                    else self.select(positions, box, cell_list))
            return {'max_neighbors': bsel.max_rad,
                    'max_cell_occupancy': bsel.max_cell_occupancy,
                    'max_angular': bsel.max_ang}
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
        raw = self.overflow_counts(positions, box, cell_list, sel)
        if self.aev_impl in ('blocked', 'pallas', 'window'):
            counts = {k: np.asarray(v) for k, v in raw.items()}
            rad_caps = (self.blocked_layout.ang_caps
                        if self.aev_impl == 'window'
                        else self.blocked_layout.rad_caps)
            cell_cap = (np.asarray(self.blocked_layout.cell_caps)
                        if self.aev_impl == 'window'
                        else cell_list.cell_capacity)
            caps = {'max_neighbors': np.asarray(rad_caps),
                    'max_cell_occupancy': cell_cap,
                    'max_angular': np.asarray(self.blocked_layout.ang_caps)}
            if 'max_cell_occupancy_ang' in raw:
                caps['max_cell_occupancy_ang'] = np.asarray(
                    self.blocked_layout.ang_cell_caps)
            if 'num_big_cells' in raw:
                caps['num_big_cells'] = self.blocked_layout.num_big_cells
            if 'ang_tier_rows' in raw:
                caps['ang_tier_rows'] = np.cumsum(np.asarray(
                    self.blocked_layout.ang_tier_rows), axis=0)
            if 'cluster_jcount' in raw:
                plan = self.blocked_layout.cluster_plan
                caps['cluster_jcount'] = np.asarray(plan.jcaps)
                caps['cluster_cand'] = np.asarray(plan.cand_caps)
                caps['cluster_mirror'] = plan.kmir
                caps['cluster_geom'] = 0
            bad = {k: (counts[k].tolist(), np.asarray(caps[k]).tolist())
                   for k in counts if np.any(counts[k] > caps[k])}
        else:
            counts = {k: int(v) for k, v in raw.items()}
            caps = {'max_neighbors': cell_list.capacity,
                    'max_cell_occupancy': cell_list.cell_capacity,
                    'max_angular': self.angular_capacity or cell_list.capacity}
            bad = {k: (counts[k], caps[k]) for k in counts
                   if counts[k] > caps[k]}
        if bad:
            raise RuntimeError(
                f'neighbor capacity overflow (true count > capacity): {bad}; '
                'rebuild with larger capacities (nnpops_tpu.native.plan_capacities)')

    def energy_from_selection(self, params: ANIParams, positions: Array,
                              box: Array, cell_list, sel) -> Array:
        """Energy against a frozen neighbor selection (slot-sticky stepping):
        only the differentiable payload phase runs — build the cell list with
        cutoff + skin and refresh ``sel`` every few steps
        (md.run_md_sticky). ``sel`` may be a SlotSelection (aev_impl
        'payload') or a BlockedSelection (aev_impl 'blocked')."""
        from ..neighbors.blocked import BlockedSelection
        from ..neighbors.window import WindowSelection
        if isinstance(sel, WindowSelection):
            from ..neighbors.window import window_features
            from ..ops.batched_nn import ensemble_energy_grouped_rows
            g = self.grouping
            feat = window_features(cell_list, positions, box, sel,
                                   self.basis, self.blocked_layout,
                                   atom_order=jnp.asarray(g.order),
                                   radial_impl=self.window_radial)
            if self.nn_impl == 'fused':
                from ..ops.pallas_nn import ensemble_energy_grouped_rows_fused
                e_nn = ensemble_energy_grouped_rows_fused(params.ensemble,
                                                          feat, g.counts)
            else:
                e_nn = ensemble_energy_grouped_rows(params.ensemble, feat,
                                                    g.counts,
                                                    self.nn_compute_dtype)
            sae = jnp.sum(params.self_energies[
                jnp.asarray(self.species_array)])
            return e_nn + sae
        if isinstance(sel, BlockedSelection):
            from ..neighbors.blocked import payload_from_blocked
            from ..ops.aev_blocked import compute_aev_blocked
            from ..ops.batched_nn import ensemble_energy_grouped_rows
            pallas = self.aev_impl == 'pallas'
            # Compose the species grouping into the payload's row reorder:
            # the AEV rows then emerge species-grouped and the ensemble runs
            # on static row slices with no per-step [N, aev] gather.
            g = self.grouping
            io_g = sel.inv_order[jnp.asarray(g.order)]
            payload = payload_from_blocked(cell_list, positions, box, sel,
                                           rad_only=pallas,
                                           layout=self.blocked_layout,
                                           row_order=io_g)
            radial, angular = compute_aev_blocked(
                payload, self.basis, self.blocked_layout, self.aev_chunk_size,
                angular_impl='pallas' if pallas else 'xla')
            feat = jnp.concatenate([radial, angular], axis=1)
            if self.nn_impl == 'fused':
                from ..ops.pallas_nn import ensemble_energy_grouped_rows_fused
                e_nn = ensemble_energy_grouped_rows_fused(params.ensemble,
                                                          feat, g.counts)
            else:
                e_nn = ensemble_energy_grouped_rows(params.ensemble, feat,
                                                    g.counts,
                                                    self.nn_compute_dtype)
            sae = jnp.sum(params.self_energies[
                jnp.asarray(self.species_array)])
            return e_nn + sae
        else:
            from ..ops.aev import compute_aev_from_payload
            payload = cell_list.payload_from_selection(
                positions, box, sel, jnp.asarray(self.species_onehot))
            cap = self.angular_capacity or cell_list.capacity
            cdt = jnp.bfloat16 if self.aev_bf16 else None
            radial, angular = compute_aev_from_payload(
                payload, self.basis, cap, self.aev_chunk_size, cdt)
        feat = jnp.concatenate([radial, angular], axis=1)
        e_nn = ensemble_energy(params.ensemble, feat, self.grouping,
                                self.nn_compute_dtype)
        sae = jnp.sum(params.self_energies[jnp.asarray(self.species_array)])
        return e_nn + sae

    def energy_and_forces_from_selection(self, params: ANIParams,
                                         positions: Array, box: Array,
                                         cell_list, sel) -> Tuple[Array, Array]:
        e, grad = jax.value_and_grad(self.energy_from_selection, argnums=1)(
            params, positions, box, cell_list, sel)
        return e, -grad
