from .pairs import get_neighbor_pairs, neighbor_pairs_masked, NeighborPairs, MaskedPairs
