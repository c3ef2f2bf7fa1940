#!/usr/bin/env bash
# The CI test entry point — also directly runnable by any driver/agent.
# Runs on the virtual 8-device CPU mesh (conftest.py pins the platform).
#
# Default: the QUICK gate (everything not marked `slow`) — the heavyweight
# interpret-mode Pallas and 1300-molecule cluster fixtures are marked slow
# and run in the separate full job (`ci/run_tests.sh --full`, CI's
# scheduled/slow lane), keeping the per-commit gate fast on 1-CPU runners.
set -euo pipefail
cd "$(dirname "$0")/.."
# Parallelize across cores when the runner has them (pytest-xdist is baked
# into the image; each worker re-pins the CPU platform via conftest.py).
# `-n auto` = one worker per available core as counted by xdist itself (no
# psutil dependency, unlike `-n logical`). On a 1-core host -n would only
# add IPC overhead.
XDIST=()
if [[ "$(nproc)" -gt 1 ]] && python -c 'import xdist' 2>/dev/null; then
    XDIST=(-n auto)
fi
if [[ "${1:-}" == "--full" ]]; then
    shift
    python -m pytest tests/ -x -q "${XDIST[@]}" "$@"
else
    python -m pytest tests/ -x -q -m "not slow" "${XDIST[@]}" "$@"
fi
