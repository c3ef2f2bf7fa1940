"""Differential ligand suite: the full ANI pipeline vs an independent
torch-float64 oracle on the reference's 7 drug-ligand fixtures.

This re-expresses the reference's core test strategy
(TestOptimizedTorchANI.py:35-66: build the upstream model, swap in the
optimized one, gate at 5e-7 relative energy / 5e-3 max relative force).
Trained ANI-2x weights are NOT obtainable in this environment (no torchani
install, no network — see PARITY.md), so the ensemble weights are random but
shared bit-exactly between both implementations; the oracle is an
independently written torch implementation of the TorchANI math
(AEV per CpuANISymmetryFunctions.cpp:99-109/:141-147/:183-190, CELU atomic
networks per BatchedNN.py:97-109, SAE shift per EnergyShifter.py:45-52),
evaluated in float64 with torch autograd forces.
"""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip('torch')

from nnpops_tpu.config import ANI2X_LAYER_DIMS, ANIBasis
from nnpops_tpu.models.ani import ANIModel, init_ani_params
from nnpops_tpu.utils.io import load_mol2

MOLECULES = '/root/reference/src/pytorch/molecules'
# Self-contained fixture data: coordinates + atomic numbers of the
# reference's 7 drug-ligand mol2 files (implementation-independent test
# DATA, same category as the golden AEV constants; regenerate with
# tests/data/make_ligands_npz.py against a reference checkout).
LIGANDS_NPZ = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'data', 'ligands.npz')
LIGANDS = ['1hvj', '1hvk', '2iuz', '3hkw', '3hky', '3lka', '3o99']


def load_ligand(name):
    """(positions [N,3] f64, atomic_numbers [N] int) for a named ligand:
    from the in-repo npz fixture, else parsed from the mounted reference."""
    if os.path.exists(LIGANDS_NPZ):
        data = np.load(LIGANDS_NPZ)
        return (data[f'{name}_positions'],
                data[f'{name}_atomic_numbers'])
    path = os.path.join(MOLECULES, f'{name}_ligand.mol2')
    if not os.path.exists(path):
        pytest.skip('no ligands.npz and reference fixtures not mounted')
    mol = load_mol2(path)
    return mol.positions, mol.atomic_numbers


def torch_oracle_energy(positions, species, basis: ANIBasis, params):
    """Independent torch-f64 ANI: dense AEV + per-species CELU ensembles."""
    pos = positions
    n = pos.shape[0]
    delta = pos[None, :, :] - pos[:, None, :]            # delta[i, j] = xj - xi
    d2 = (delta ** 2).sum(-1)
    eye = torch.eye(n, dtype=torch.bool)
    r = torch.sqrt(torch.where(eye, torch.ones_like(d2), d2))

    # Radial block (CpuANISymmetryFunctions.cpp:141-147; torchani x0.25).
    rc = basis.radial_cutoff
    fc = torch.where((r < rc) & ~eye, 0.5 * torch.cos(math.pi * r / rc) + 0.5,
                     torch.zeros_like(r))
    eta_r = torch.tensor(basis.radial_eta, dtype=pos.dtype)
    rs_r = torch.tensor(basis.radial_rs, dtype=pos.dtype)
    term = fc[:, :, None] * torch.exp(-eta_r * (r[:, :, None] - rs_r) ** 2)
    radial = torch.zeros((n, basis.num_species, basis.num_radial),
                         dtype=pos.dtype)
    for s in range(basis.num_species):
        mask = torch.tensor(species == s)
        radial[:, s, :] = term[:, mask, :].sum(1)
    radial = radial * 0.25

    # Angular block (CpuANISymmetryFunctions.cpp:183-190; 0.95 dot scale
    # :392-393; 2^(1-zeta) scale :104-109).
    ra = basis.angular_cutoff
    fca = torch.where((r < ra) & ~eye, 0.5 * torch.cos(math.pi * r / ra) + 0.5,
                      torch.zeros_like(r))
    num_pairs = basis.num_species_pairs
    angular = torch.zeros((n, num_pairs, basis.num_angular), dtype=pos.dtype)
    eta_a = torch.tensor(basis.angular_eta, dtype=pos.dtype)
    rs_a = torch.tensor(basis.angular_rs, dtype=pos.dtype)
    zeta = torch.tensor(basis.angular_zeta, dtype=pos.dtype)
    ts = torch.tensor(basis.angular_thetas, dtype=pos.dtype)
    pair_index = np.zeros((basis.num_species, basis.num_species), np.int64)
    idx = 0
    for s1 in range(basis.num_species):
        for s2 in range(s1, basis.num_species):
            pair_index[s1, s2] = pair_index[s2, s1] = idx
            idx += 1
    pair_index_t = torch.tensor(pair_index)
    species_t = torch.tensor(np.asarray(species, np.int64))
    for i in range(n):
        nbrs = torch.nonzero((r[i] < ra) & ~eye[i]).reshape(-1)
        if len(nbrs) < 2:
            continue
        jj, kk = torch.triu_indices(len(nbrs), len(nbrs), offset=1)
        j = nbrs[jj]
        k = nbrs[kk]
        d1 = delta[i, j]                                  # [P, 3]
        d2v = delta[i, k]
        r1 = r[i, j]
        r2 = r[i, k]
        cos = 0.95 * (d1 * d2v).sum(-1) / (r1 * r2)
        theta = torch.acos(torch.clamp(cos, -1.0, 1.0))   # [P]
        rm = 0.5 * (r1 + r2)
        w = (fca[i, j][:, None] * fca[i, k][:, None]
             * (1 + torch.cos(theta[:, None] - ts)) ** zeta
             * torch.exp(-eta_a * (rm[:, None] - rs_a) ** 2))   # [P, A]
        pid = pair_index_t[species_t[j], species_t[k]]
        angular[i] = angular[i].index_add(0, pid, w)
    angular = angular * 2.0 ** (1.0 - zeta)

    aev = torch.cat([radial.reshape(n, -1), angular.reshape(n, -1)], dim=1)

    # Atomic networks: per-species CELU(0.1) MLP ensemble (BatchedNN.py:97-109)
    # + SAE shift (EnergyShifter.py:45-52).
    total = torch.zeros((), dtype=pos.dtype)
    for i in range(n):
        s = int(species[i])
        net = params.ensemble.networks[s]
        models = net.weights[0].shape[0]
        e_models = []
        for m in range(models):
            h = aev[i]
            for li, (w, bvec) in enumerate(zip(net.weights, net.biases)):
                wt = torch.tensor(np.asarray(w[m]), dtype=pos.dtype)
                bt = torch.tensor(np.asarray(bvec[m]), dtype=pos.dtype)
                h = wt @ h + bt
                if li < len(net.weights) - 1:
                    h = torch.celu(h, alpha=0.1)
            e_models.append(h[0])
        total = total + torch.stack(e_models).mean()
    sae = torch.tensor(np.asarray(params.self_energies), dtype=pos.dtype)
    total = total + sae[torch.tensor(np.asarray(species, np.int64))].sum()
    return total


@pytest.mark.parametrize('name', LIGANDS)
def test_ligand_energy_force_parity(name):
    positions, atomic_numbers = load_ligand(name)
    basis = ANIBasis.ani2x()
    model = ANIModel.from_atomic_numbers(atomic_numbers, basis)
    # Realistic self-atomic energies (Hartree-scale, as in ANI-2x): the
    # reference's 5e-7 relative-energy gate is defined on SAE-dominated
    # totals (EnergyShifter.py:45-52); without them random-weight energies
    # nearly cancel and the relative measure is meaningless.
    # ~-5 Ha per atom: large enough that the relative gate is meaningful,
    # small enough that f32 total-energy resolution stays ~1e-5.
    sae = np.array([-4.5, -5.6, -5.1, -5.8, -4.9, -5.3, -5.7], np.float32)
    params = init_ani_params(jax.random.PRNGKey(7), basis,
                             layer_dims=ANI2X_LAYER_DIMS, num_models=2,
                             self_energies=sae)

    e_jax, f_jax = jax.jit(model.energy_and_forces)(
        params, jnp.asarray(positions, jnp.float32))

    species = model.species_array
    pos_t = torch.tensor(np.asarray(positions, np.float64),
                         requires_grad=True)
    e_t = torch_oracle_energy(pos_t, species, basis, params)
    e_t.backward()
    f_t = -pos_t.grad.numpy()

    # The reference gates: rel energy < 5e-7, max rel force < 5e-3
    # (TestOptimizedTorchANI.py:58-66), loosened for the numerically
    # unstable 3o99 ligand exactly as the reference loosens it
    # (TestSymmetryFunctions.py:66-70). Ours compares f32 against an f64
    # oracle, so the energy gates allow f32 summation noise.
    e_ref = float(e_t.detach())
    rel_e = abs(float(e_jax) - e_ref) / max(abs(e_ref), 1e-10)
    assert rel_e < 5e-7, (float(e_jax), e_ref)
    # Stricter, SAE-independent check: per-atom absolute NN-energy error.
    per_atom = abs(float(e_jax) - e_ref) / positions.shape[0]
    assert per_atom < 2e-6, per_atom
    scale = np.abs(f_t).max()
    rel_f = np.abs(np.asarray(f_jax) - f_t).max() / scale
    f_gate = 2.5e-2 if name == '3o99' else 5e-3
    assert rel_f < f_gate, rel_f
