"""Combined force field: ANI potential + PME electrostatics.

The north-star MD configuration (BASELINE config 5) couples the ANI-2x
NN potential with PME long-range electrostatics, both on their production
fast paths in ONE jitted program:

* the ANI part runs the window pipeline against a frozen selection
  (slot-sticky Verlet-skin stepping, like ``ANIModel`` alone);
* the PME direct-space term runs the dense per-cell window Pallas kernel
  (``ops.pallas_pme``) on its own cutoff-sized grid — no pair list, no
  per-pair gathers (the flat-pair route it replaces measured 438 ms of a
  454 ms 26k-atom PME evaluation, NOTES_PERF round-2);
* the PME reciprocal term uses the scatter-free chunked spreading + XLA
  rfftn (``ops.pme.spread_charges_chunked``).

Soft-failure contract: ``overflow_counts``/``check_overflow`` aggregate
the ANI capacities with the PME window occupancy and spread-chunk counts
(the ``number_found_pairs`` pattern, getNeighborPairs.py:77-83) — call
between scanned segments.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..neighbors.cell_list import CellList, payload_to_half_pairs
from ..ops.pme import (PME, pme_direct_energy, pme_reciprocal_energy,
                       pme_self_energy, spread_capacity, spread_overflow)
from .ani import ANIModel, ANIParams

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ANIWithPME:
    """ANI potential + PME electrostatics on a fixed-topology system.

    Build with :meth:`create` (plans the PME direct window from a reference
    configuration). The PME direct grid is independent of the ANI cell
    list, so any ``pme_cutoff`` works; when no window plan fits the box the
    direct term falls back to the shared-neighbor flat-pair path (which
    then requires ``pme_cutoff <= ANI radial cutoff``).
    """
    ani: ANIModel
    pme: PME
    pme_cutoff: float
    # (ncells3, capacity) from PME.plan_direct_window, or None -> pair path.
    pme_window_plan: Optional[Tuple] = None

    @classmethod
    def create(cls, ani: ANIModel, pme: PME, pme_cutoff: float,
               positions=None, box=None, margin: float = 1.25) -> 'ANIWithPME':
        """Compose the models; with a reference configuration, plan the PME
        direct window grid (host-side, once)."""
        plan = None
        if positions is not None and box is not None:
            grid, cap, small, nbig = pme.plan_direct_window(
                box, pme_cutoff, positions, margin=margin, bucket=True)
            if grid is not None:
                # Cell-occupancy bucketing (round 5): ~6% off the 26k
                # direct kernel; the big-cell-count limit rides the same
                # overflow channel (direct_window_overflow handles the
                # 4-tuple plan).
                plan = (grid, cap, small, nbig)
        return cls(ani=ani, pme=pme, pme_cutoff=pme_cutoff,
                   pme_window_plan=plan)

    # ---- Selection API (slot-sticky stepping, mirrors ANIModel's).

    def select(self, positions: Array, box: Array, cell_list: CellList):
        return self.ani.select(positions, box, cell_list)

    def _pme_energy(self, positions: Array, charges: Array, box: Array,
                    cell_list: CellList) -> Array:
        if self.pme_window_plan is not None:
            e_dir = self.pme.compute_direct_window(
                positions, charges, self.pme_cutoff, box,
                self.pme_window_plan)
        else:
            payload = cell_list.build_payload(positions, box)
            pairs = payload_to_half_pairs(payload, self.pme_cutoff)
            e_dir = pme_direct_energy(positions, charges, pairs,
                                      self.pme.exclusions,
                                      self.pme.config.alpha,
                                      self.pme.config.coulomb)
        e_rec = (pme_self_energy(charges, self.pme.config.alpha,
                                 self.pme.config.coulomb)
                 + pme_reciprocal_energy(positions, charges, box,
                                         self.pme.config, self.pme.moduli))
        return e_dir + e_rec

    def energy_from_selection(self, params: ANIParams, positions: Array,
                              charges: Array, box: Array,
                              cell_list: CellList, sel) -> Array:
        """Total energy against a frozen ANI selection: window-path ANI +
        window-kernel PME direct + chunked reciprocal, one jitted program."""
        e_ani = self.ani.energy_from_selection(params, positions, box,
                                               cell_list, sel)
        return e_ani + self._pme_energy(positions, charges, box, cell_list)

    def energy_and_forces_from_selection(
            self, params: ANIParams, positions: Array, charges: Array,
            box: Array, cell_list: CellList, sel) -> Tuple[Array, Array]:
        e, g = jax.value_and_grad(self.energy_from_selection, argnums=1)(
            params, positions, charges, box, cell_list, sel)
        return e, -g

    # ---- One-shot API (selection built inline; same fast paths).

    def energy(self, params: ANIParams, positions: Array, charges: Array,
               box: Array, cell_list: CellList) -> Array:
        e_ani = self.ani.energy_fused(params, positions, box, cell_list)
        return e_ani + self._pme_energy(positions, charges, box, cell_list)

    def energy_and_forces(self, params: ANIParams, positions: Array,
                          charges: Array, box: Array,
                          cell_list: CellList) -> Tuple[Array, Array]:
        e, g = jax.value_and_grad(self.energy, argnums=1)(
            params, positions, charges, box, cell_list)
        return e, -g

    # ---- Soft-failure contract (getNeighborPairs.py:77-83 pattern).

    def overflow_counts(self, positions: Array, charges: Array, box: Array,
                        cell_list: CellList, sel=None) -> dict:
        """TRUE counts for every static capacity in the combined pipeline,
        as data (jit-safe): the ANI counts plus 'pme_window_occupancy'
        (vs ``pme_window_plan[1]``) and 'pme_spread_chunk' (vs
        ``spread_capacity``)."""
        counts = dict(self.ani.overflow_counts(positions, box, cell_list,
                                               sel))
        if self.pme_window_plan is not None:
            counts['pme_window_occupancy'] = self.pme.direct_window_overflow(
                positions, box, self.pme_window_plan)
        counts['pme_spread_chunk'] = spread_overflow(
            positions, charges, box, self.pme.config)
        return counts

    def check_overflow(self, positions: Array, charges: Array, box: Array,
                       cell_list: CellList, sel=None) -> None:
        """Host-side assertion that no static capacity overflowed (call
        outside jit, between scanned segments)."""
        self.ani.check_overflow(positions, box, cell_list, sel)
        if self.pme_window_plan is not None:
            occ = int(self.pme.direct_window_overflow(
                positions, box, self.pme_window_plan))
            cap = int(self.pme_window_plan[1])
            if occ > cap:
                raise RuntimeError(
                    f'PME direct window occupancy overflow: {occ} > {cap}; '
                    're-plan with plan_direct_window')
        sc = int(spread_overflow(positions, charges, box, self.pme.config))
        cap = spread_capacity(positions.shape[0], self.pme.config)
        if sc > cap:
            raise RuntimeError(
                f'PME spread chunk overflow: {sc} > {cap}')
