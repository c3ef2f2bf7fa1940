from .integrators import (MDState, initialize, langevin_baoab, velocity_verlet,
                          run_md, kinetic_energy)
from .checkpoint import save_checkpoint, load_checkpoint
