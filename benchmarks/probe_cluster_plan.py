"""Host-side sizing study for a cluster-pair radial formulation at 26k.

Species-pure 8-atom clusters (built by cell+z sort within species), j-list
per i-cluster = clusters with exact min atom-pair distance < rc (+skin).
Reports per-species j-cluster count distributions -> the static lane caps a
cluster-pair kernel would need, vs the dense window's 27*c lanes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from nnpops_tpu.utils.water import make_water_box

NMOL = int(os.environ.get('NMOL', '8670'))
CL = int(os.environ.get('CL', '8'))       # cluster size
RC = 5.1
SKIN = 0.25
R = RC + SKIN

water = make_water_box(NMOL, seed=0)
pos = np.asarray(water.positions, np.float64)
box = np.asarray(water.box, np.float64)
species = np.asarray([0 if z == 8 else 1 for z in water.atomic_numbers])
L = np.diag(box).copy()
n = len(pos)
print(f'n={n} box={L}')

# Wrap into the box.
pos = pos - np.floor(pos / L) * L


def build_clusters(p, sp_mask):
    """Sort species atoms by (cell_x, cell_y, z) with ~cluster-sized cells,
    chunk into CL-atom clusters; returns (indices [nc, CL], centers, radii)."""
    idx = np.where(sp_mask)[0]
    q = p[idx]
    # Target cells holding ~2 clusters of this species in xy footprint.
    dens = len(idx) / L.prod()
    side = (CL / dens) ** (1 / 3)
    ncx = max(1, int(round(L[0] / side)))
    ncy = max(1, int(round(L[1] / side)))
    cx = np.minimum((q[:, 0] / L[0] * ncx).astype(int), ncx - 1)
    cy = np.minimum((q[:, 1] / L[1] * ncy).astype(int), ncy - 1)
    order = np.lexsort((q[:, 2], cy, cx))
    idx = idx[order]
    pad = (-len(idx)) % CL
    if pad:
        idx = np.concatenate([idx, np.full(pad, -1)])
    return idx.reshape(-1, CL)


def min_d2_clusters(pa, pb):
    d = pa[:, None, :] - pb[None, :, :]
    d -= np.round(d / L) * L
    return (d ** 2).sum(-1)


for CLs in ([4, 8] if 'CLSWEEP' in os.environ else [CL]):
    globals()['CL'] = CLs
    cl_o = build_clusters(pos, species == 0)
    cl_h = build_clusters(pos, species == 1)
    print(f'--- cluster size {CLs}: O clusters {len(cl_o)}, H {len(cl_h)}')
    all_cl = [cl_o, cl_h]
    rng = np.random.default_rng(0)
    # Sample i-clusters, count j-clusters per species by exact min distance.
    for si, cli in enumerate(all_cl):
        sample = rng.choice(len(cli), size=min(400, len(cli)), replace=False)
        counts = np.zeros((len(sample), 2), int)
        pairs_true = np.zeros(len(sample))
        for k, ic in enumerate(sample):
            ia = cli[ic]
            ia = ia[ia >= 0]
            pa = pos[ia]
            for sj, clj in enumerate(all_cl):
                # Coarse prefilter by cluster centroid distance.
                cent = pos[np.where(clj >= 0, clj, clj[:, :1])].mean(1)
                dc = cent - pa.mean(0)
                dc -= np.round(dc / L) * L
                cand = np.where((dc ** 2).sum(-1) < (R + 12.0) ** 2)[0]
                cnt = 0
                for jc in cand:
                    ja = clj[jc]
                    ja = ja[ja >= 0]
                    d2 = min_d2_clusters(pa, pos[ja])
                    if d2.min() < R * R:
                        cnt += 1
                    pairs_true[k] += (d2 < RC * RC).sum()
                counts[k, sj] = cnt
        mean = counts.mean(0)
        p99 = np.percentile(counts, 99, axis=0)
        mx = counts.max(0)
        lanes_mean = (mean * CLs).sum()
        lanes_cap = (mx * CLs).sum()
        print(f'  i-species {si}: j-cluster counts mean {mean.round(1)} '
              f'p99 {p99} max {mx}; lanes mean {lanes_mean:.0f} '
              f'cap {lanes_cap:.0f}; true pairs/i-cluster '
              f'{pairs_true.mean():.0f}')
print('window reference: kk = 27*40 = 1080 lanes/center-row')
