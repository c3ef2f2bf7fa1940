"""Frozen, hashable configuration dataclasses.

The reference passes all configuration through constructor arguments
(``src/ani/ANISymmetryFunctions.h:60-64``, ``src/pytorch/pme/pme.py:52-92``).
Here every config is a frozen dataclass with tuple fields so it can be a
static argument to ``jax.jit`` (SURVEY §5 "Config / flag system").
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class ANIBasis:
    """The ANI symmetry-function basis.

    Mirrors the parameters of ``ANISymmetryFunctions`` (ANISymmetryFunctions.h:60-64):
    per-function (eta, rs) radial parameters and (eta, rs, zeta, thetas)
    angular parameters, plus the two cutoffs and the ``torchani``
    compatibility flag (ANISymmetryFunctions.h:55-58 — TorchANI mode divides
    radial functions by 4 and multiplies the angle dot product by 0.95;
    publication mode uses the exact angle).
    """
    num_species: int
    radial_cutoff: float
    angular_cutoff: float
    radial_eta: Tuple[float, ...]
    radial_rs: Tuple[float, ...]
    angular_eta: Tuple[float, ...]
    angular_rs: Tuple[float, ...]
    angular_zeta: Tuple[float, ...]
    angular_thetas: Tuple[float, ...]
    torchani: bool = True
    # When the angular functions form a single-eta/zeta product grid
    # rs x thetas (as in ANI), these record the factor grids; the AEV kernel
    # then evaluates the [rs] and [thetas] factors separately and combines
    # them by outer product, cutting per-triple transcendentals ~6x.
    # Set automatically by from_grids; None disables the factored path.
    angular_rs_grid: Optional[Tuple[float, ...]] = None
    angular_thetas_grid: Optional[Tuple[float, ...]] = None

    def __post_init__(self):
        n = len(self.radial_eta)
        if not (len(self.radial_rs) == n):
            raise ValueError('radial parameter lists must have equal length')
        m = len(self.angular_eta)
        if not (len(self.angular_rs) == m == len(self.angular_zeta) == len(self.angular_thetas)):
            raise ValueError('angular parameter lists must have equal length')

    @property
    def num_radial(self) -> int:
        return len(self.radial_eta)

    @property
    def num_angular(self) -> int:
        return len(self.angular_eta)

    @property
    def num_species_pairs(self) -> int:
        s = self.num_species
        return s * (s + 1) // 2

    @property
    def radial_length(self) -> int:
        """Length of the radial AEV block per atom."""
        return self.num_species * self.num_radial

    @property
    def angular_length(self) -> int:
        """Length of the angular AEV block per atom."""
        return self.num_species_pairs * self.num_angular

    @property
    def aev_length(self) -> int:
        return self.radial_length + self.angular_length

    @classmethod
    def from_grids(cls, num_species: int, Rcr: float, Rca: float,
                   EtaR, ShfR, EtaA, Zeta, ShfA, ShfZ,
                   torchani: bool = True) -> 'ANIBasis':
        """Expand TorchANI-style parameter grids into flat function lists.

        Expansion order matches the reference binding
        (SymmetryFunctions.cpp:110-120): radial = EtaR x ShfR; angular =
        EtaA x Zeta x ShfA x ShfZ — this order defines the AEV layout.
        """
        r_eta, r_rs = [], []
        for eta in EtaR:
            for rs in ShfR:
                r_eta.append(float(eta))
                r_rs.append(float(rs))
        a_eta, a_rs, a_zeta, a_ts = [], [], [], []
        for eta in EtaA:
            for zeta in Zeta:
                for rs in ShfA:
                    for ts in ShfZ:
                        a_eta.append(float(eta))
                        a_rs.append(float(rs))
                        a_zeta.append(float(zeta))
                        a_ts.append(float(ts))
        grid_kwargs = {}
        if len(EtaA) == 1 and len(Zeta) == 1:
            grid_kwargs = dict(
                angular_rs_grid=tuple(float(x) for x in ShfA),
                angular_thetas_grid=tuple(float(x) for x in ShfZ))
        return cls(num_species=num_species, radial_cutoff=float(Rcr),
                   angular_cutoff=float(Rca),
                   radial_eta=tuple(r_eta), radial_rs=tuple(r_rs),
                   angular_eta=tuple(a_eta), angular_rs=tuple(a_rs),
                   angular_zeta=tuple(a_zeta), angular_thetas=tuple(a_ts),
                   torchani=torchani, **grid_kwargs)

    @classmethod
    def ani2x(cls, torchani: bool = True) -> 'ANIBasis':
        """The ANI-2x basis: 7 species, 16 radial x 32 angular functions,
        Rcr=5.1 A, Rca=3.5 A (the workload of the reference benchmark,
        BenchmarkCudaANISymmetryFunctions.cu:101-153)."""
        ShfR = np.linspace(0.8, 5.1, 17)[:16]           # 0.8 .. 4.83125, step 0.26875
        ShfA = np.linspace(0.8, 3.5, 9)[:8]             # 0.8 .. 3.1625, step 0.3375
        ShfZ = (np.arange(4) + 0.5) * (math.pi / 4.0)   # 0.3927 .. 2.7489
        return cls.from_grids(7, 5.1, 3.5, EtaR=[19.7], ShfR=ShfR,
                              EtaA=[12.5], Zeta=[14.1], ShfA=ShfA, ShfZ=ShfZ,
                              torchani=torchani)


# ANI-2x supported elements in species order (H, C, N, O, S, F, Cl).
ANI2X_ELEMENTS: Tuple[int, ...] = (1, 6, 7, 8, 16, 9, 17)

# Hidden-layer widths of the ANI-2x atomic networks per species, in the same
# order as ANI2X_ELEMENTS. Each network is
# aev -> h1 -> h2 -> h3 -> 1 with CELU(alpha=0.1) between layers
# (the 4-layer 0/2/4/6 structure consumed by BatchedNN.py:97-103).
ANI2X_LAYER_DIMS: Tuple[Tuple[int, ...], ...] = (
    (256, 192, 160),   # H
    (224, 192, 160),   # C
    (192, 160, 128),   # N
    (192, 160, 128),   # O
    (160, 128, 96),    # S
    (160, 128, 96),    # F
    (160, 128, 96),    # Cl
)


@dataclasses.dataclass(frozen=True)
class CFConvConfig:
    """SchNet continuous-filter convolution configuration (schnet/CFConv.h:125-137)."""
    width: int
    num_gaussians: int
    cutoff: float
    gaussian_width: float
    activation: str = 'ssp'   # 'ssp' (shifted softplus) or 'tanh' (CFConv.h:114-123)

    def __post_init__(self):
        if self.activation not in ('ssp', 'tanh'):
            raise ValueError("activation must be 'ssp' or 'tanh'")

    @property
    def gaussian_positions(self) -> np.ndarray:
        """Gaussian centers uniformly spaced on [0, cutoff] (CpuCFConv.cpp:121-122)."""
        g = self.num_gaussians
        return np.arange(g, dtype=np.float32) * (self.cutoff / (g - 1))


@dataclasses.dataclass(frozen=True)
class PMEConfig:
    """Particle Mesh Ewald configuration (pme/pme.py:52-92)."""
    gridx: int
    gridy: int
    gridz: int
    order: int
    alpha: float
    coulomb: float

    def __post_init__(self):
        if min(self.gridx, self.gridy, self.gridz) < 1:
            raise ValueError('The grid dimensions must be positive')
        if self.order < 1:
            raise ValueError('order must be positive')
        if self.alpha <= 0:
            raise ValueError('alpha must be positive')
        if self.coulomb <= 0:
            raise ValueError('coulomb must be positive')

    @property
    def grid_shape(self) -> Tuple[int, int, int]:
        return (self.gridx, self.gridy, self.gridz)
