"""Combined force field: ANI potential + PME electrostatics.

The north-star MD configuration (BASELINE config 5) couples the ANI-2x
NN potential with PME long-range electrostatics. This composite evaluates
both in one jitted program: the ANI part runs on the gather-free payload
pipeline; the PME direct-space term reuses the SAME cell-list neighbor
structure (converted to a half pair list), so the neighbor work is paid
once per step.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..neighbors.cell_list import CellList, payload_to_half_pairs
from ..ops.pme import PME, pme_direct_energy, pme_reciprocal_energy, pme_self_energy
from .ani import ANIModel, ANIParams

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ANIWithPME:
    """ANI potential + PME electrostatics on a fixed-topology system.

    The PME cutoff must not exceed the ANI radial cutoff for neighbor-list
    sharing (water-box practice: ANI 5.1 A, PME direct ~5 A is fine; for a
    larger PME cutoff, pass a second cell list).
    """
    ani: ANIModel
    pme: PME
    pme_cutoff: float

    def energy(self, params: ANIParams, positions: Array, charges: Array,
               box: Array, cell_list: CellList) -> Array:
        e_ani = self.ani.energy_fused(params, positions, box, cell_list)
        # Reuse the cell-list neighbors for the direct-space pair sum.
        payload = cell_list.build_payload(positions, box)
        pairs = payload_to_half_pairs(payload, self.pme_cutoff)
        e_dir = pme_direct_energy(positions, charges, pairs,
                                  self.pme.exclusions, self.pme.config.alpha,
                                  self.pme.config.coulomb)
        e_rec = (pme_self_energy(charges, self.pme.config.alpha,
                                 self.pme.config.coulomb)
                 + pme_reciprocal_energy(positions, charges, box,
                                         self.pme.config, self.pme.moduli))
        return e_ani + e_dir + e_rec

    def energy_and_forces(self, params: ANIParams, positions: Array,
                          charges: Array, box: Array,
                          cell_list: CellList) -> Tuple[Array, Array]:
        e, g = jax.value_and_grad(self.energy, argnums=1)(
            params, positions, charges, box, cell_list)
        return e, -g
