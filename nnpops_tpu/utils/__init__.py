from .water import make_water_box, WaterBox, TIP3P_CHARGES
from .io import load_mol2, load_pdb, Molecule
