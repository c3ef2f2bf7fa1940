"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count) since only one real TPU chip is
available; bench.py runs on the real chip.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

# The image pre-imports jax and registers the remote-TPU backend in every
# process (sitecustomize), so the env var alone is not enough: force the
# platform through the config as well, before any backend is instantiated.
import jax

jax.config.update('jax_platforms', 'cpu')

import pathlib

import numpy as np
import pytest

DATA_DIR = pathlib.Path(__file__).parent / 'data'


@pytest.fixture(scope='session')
def golden_ani():
    """Golden ANI AEV values for the 18-atom water cluster, computed with
    TorchANI (reference TestANISymmetryFunctions.h:60-255)."""
    return dict(np.load(DATA_DIR / 'golden_ani_water.npz'))


@pytest.fixture(scope='session')
def golden_cfconv():
    """Golden CFConv outputs for the same cluster, computed with SchNetPack
    (reference TestCFConv.h:81-248)."""
    return dict(np.load(DATA_DIR / 'golden_cfconv_water.npz'))
