"""nnpops_tpu: TPU-native JAX framework for neural-network-potential inference.

A from-scratch rebuild of the capabilities of openmm/NNPOps (reference:
/root/reference) designed for TPU: masked static-shape neighbor lists, AEV and
CFConv featurization as one-hot MXU contractions, species-grouped MLP
ensembles, PME electrostatics with XLA FFTs, forces via jax.grad, and whole MD
trajectories under jax.lax.scan.
"""
from .config import ANIBasis, CFConvConfig, PMEConfig, ANI2X_ELEMENTS, ANI2X_LAYER_DIMS

__version__ = '0.1.0'
