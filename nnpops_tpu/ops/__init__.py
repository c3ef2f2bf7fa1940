from .aev import compute_aev, aev_forward, AEV, dense_neighbor_list, species_pair_index
from .batched_nn import (EnsembleParams, SpeciesNet, init_ensemble, ensemble_energy,
                         atomic_energies_grouped, build_grouping, batched_linear,
                         pad_ensemble, apply_padded_ensemble, celu)
