from .aev import compute_aev, aev_forward, AEV, dense_neighbor_list, species_pair_index
from .batched_nn import (EnsembleParams, SpeciesNet, init_ensemble, ensemble_energy,
                         atomic_energies_grouped, build_grouping, batched_linear,
                         pad_ensemble, apply_padded_ensemble, celu)
from .cfconv import (CFConvParams, init_cfconv, cfconv, build_cfconv_neighbors,
                     pair_filters, shifted_softplus)
from .pme import PME, pme_direct_energy, pme_reciprocal_energy, pme_self_energy, bspline_moduli
