from .ani import ANIModel, ANIParams, init_ani_params, species_from_atomic_numbers
from .schnet import SchNetModel, SchNetParams, CFConvStack
from .combined import ANIWithPME
