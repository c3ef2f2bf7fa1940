"""TorchANI parameter import/export (SURVEY §7.3: one-time torch -> npz).

The runtime never depends on torch: trained ANI parameters travel as a .npz
with a documented naming scheme, and :func:`load_ensemble_npz` rebuilds the
pytree. The exporter (:func:`export_torchani_npz`) runs wherever torchani is
installed; a converter from a plain torch state dict is also provided since
torch (CPU) is available here even though torchani is not.

npz layout::

    num_species, num_models, num_layers : int scalars
    w_s{S}_m{M}_l{L} : [out, in] float32   (torch Linear.weight layout)
    b_s{S}_m{M}_l{L} : [out] float32
    self_energies    : [num_species] float64/float32
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def save_ensemble_npz(path: str, weights, biases, self_energies=None) -> None:
    """weights[s][m][l]: [out, in] arrays; biases likewise [out]."""
    num_species = len(weights)
    num_models = len(weights[0])
    num_layers = len(weights[0][0])
    out = {'num_species': np.int32(num_species),
           'num_models': np.int32(num_models),
           'num_layers': np.int32(num_layers)}
    for s in range(num_species):
        for m in range(num_models):
            for l in range(num_layers):
                out[f'w_s{s}_m{m}_l{l}'] = np.asarray(weights[s][m][l], np.float32)
                out[f'b_s{s}_m{m}_l{l}'] = np.asarray(biases[s][m][l], np.float32)
    if self_energies is not None:
        out['self_energies'] = np.asarray(self_energies, np.float32)
    np.savez(path, **out)


def load_ensemble_npz(path: str):
    """Rebuild (EnsembleParams, self_energies) from the npz layout above.

    Weights are transposed nowhere: SpeciesNet stores [models, out, in],
    matching the torch Linear layout stacked over models.
    """
    import jax.numpy as jnp
    from ..ops.batched_nn import EnsembleParams, SpeciesNet

    with np.load(path) as data:
        ns = int(data['num_species'])
        nm = int(data['num_models'])
        nl = int(data['num_layers'])
        nets = []
        for s in range(ns):
            ws, bs = [], []
            for l in range(nl):
                w = np.stack([data[f'w_s{s}_m{m}_l{l}'] for m in range(nm)])
                b = np.stack([data[f'b_s{s}_m{m}_l{l}'] for m in range(nm)])
                ws.append(jnp.asarray(w))
                bs.append(jnp.asarray(b))
            nets.append(SpeciesNet(tuple(ws), tuple(bs)))
        sae = (jnp.asarray(data['self_energies'])
               if 'self_energies' in data else None)
    return EnsembleParams(tuple(nets)), sae


def export_torchani_npz(path: str, model_name: str = 'ANI2x') -> None:
    """One-time exporter: run where torchani IS installed.

    Extracts the ensemble linear layers (the 0/2/4/6 structure consumed by
    the reference's BatchedNN.py:55-59) and the SAE constants
    (EnergyShifter.py:45) into the npz layout.
    """
    import torchani   # noqa: F401 — deliberate hard dependency here only
    model = getattr(torchani.models, model_name)(periodic_table_index=False)
    ensemble = model.neural_networks
    models = list(ensemble) if hasattr(ensemble, '__iter__') else [ensemble]
    num_species = len(model.species_converter.conv_tensor[
        model.species_converter.conv_tensor >= 0])
    num_networks = len(list(models[0].values()))
    if num_networks != num_species:
        raise ValueError(f'converter reports {num_species} species but the '
                         f'ensemble has {num_networks} atomic networks')
    weights, biases = [], []
    for s in range(num_networks):
        w_s, b_s = [], []
        for m in models:
            seq = list(m.values())[s]
            layers = [seq[i] for i in (0, 2, 4, 6)]
            w_s.append([l.weight.detach().numpy() for l in layers])
            b_s.append([l.bias.detach().numpy() for l in layers])
        weights.append(w_s)
        biases.append(b_s)
    sae = model.energy_shifter.self_energies.detach().numpy()
    save_ensemble_npz(path, weights, biases, sae)


def import_torch_state_dict(state_dict, num_species: int, num_models: int,
                            layer_indices: Sequence[int] = (0, 2, 4, 6)):
    """Convert a torch-style flat state dict of per-species sequential nets
    (keys like '{model}.{species}.{layer}.weight') into the nested
    weights/biases lists for :func:`save_ensemble_npz`."""
    weights = [[[None] * len(layer_indices) for _ in range(num_models)]
               for _ in range(num_species)]
    biases = [[[None] * len(layer_indices) for _ in range(num_models)]
              for _ in range(num_species)]
    for key, value in state_dict.items():
        parts = key.split('.')
        if parts[-1] not in ('weight', 'bias'):
            continue
        m, s, l = int(parts[0]), int(parts[1]), int(parts[2])
        li = list(layer_indices).index(l)
        arr = np.asarray(value.detach() if hasattr(value, 'detach') else value,
                         np.float32)
        if parts[-1] == 'weight':
            weights[s][m][li] = arr
        else:
            biases[s][m][li] = arr
    return weights, biases
