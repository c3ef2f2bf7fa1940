"""Skin/refresh sweep at 26k now select is ~10.9 ms FULL (round-4): the
round-3 default (skin 0.25, refresh 6) was tuned when select cost 25.8 ms.
Larger skin grows the candidate volume (radial kernel + select cost more)
but lets the refresh amortize further; the optimum shifts as select gets
cheaper. Physics bound: refresh R is valid while R * max displacement per
step < skin/2; at 300 K water (< 0.02 A/step at 1 fs) refresh 12 needs
skin >= 0.48.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GRID = [(0.25, 6), (0.25, 8), (0.4, 8), (0.4, 10), (0.5, 12)]

for skin, refresh in GRID:
    cmd = [sys.executable, os.path.join(HERE, 'bench.py'),
           '--molecules', '8670', '--steps', '24',
           '--skin', str(skin), '--refresh', str(refresh)]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    line = [l for l in out.stdout.splitlines() if l.startswith('{')]
    if line:
        import json
        d = json.loads(line[-1])
        print(f"skin {skin} refresh {refresh}: {d['value']} us/step",
              flush=True)
    else:
        print(f"skin {skin} refresh {refresh}: FAILED\n{out.stderr[-400:]}",
              flush=True)
