"""Regenerate ligands.npz — the self-contained fixture data for
tests/test_parity_ligands.py — from a mounted reference checkout.

The npz holds coordinates + atomic numbers of the reference's 7 drug-ligand
mol2 fixtures (src/pytorch/molecules/*.mol2, 21-116 atoms) and the 306-atom
periodic water box (water.pdb), i.e. implementation-independent test DATA
in the same category as the golden AEV constants (TestANISymmetryFunctions.h).

Usage:  python tests/data/make_ligands_npz.py [reference_root]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import numpy as np

from nnpops_tpu.utils.io import load_mol2, load_pdb

LIGANDS = ['1hvj', '1hvk', '2iuz', '3hkw', '3hky', '3lka', '3o99']


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else '/root/reference'
    mols = os.path.join(root, 'src', 'pytorch', 'molecules')
    out = {}
    for name in LIGANDS:
        m = load_mol2(os.path.join(mols, f'{name}_ligand.mol2'))
        out[f'{name}_positions'] = np.asarray(m.positions, np.float64)
        out[f'{name}_atomic_numbers'] = np.asarray(m.atomic_numbers,
                                                   np.int32)
    w = load_pdb(os.path.join(mols, 'water.pdb'))
    out['water_positions'] = np.asarray(w.positions, np.float64)
    out['water_atomic_numbers'] = np.asarray(w.atomic_numbers, np.int32)
    out['water_box'] = np.asarray(w.box, np.float64)
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'ligands.npz')
    np.savez_compressed(dst, **out)
    print(f'wrote {dst}: {len(out)} arrays')


if __name__ == '__main__':
    main()
