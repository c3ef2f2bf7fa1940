from .pairs import get_neighbor_pairs, neighbor_pairs_masked, NeighborPairs, MaskedPairs
from .cell_list import CellList, NeighborList, neighbor_list_to_pairs
