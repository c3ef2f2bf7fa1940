#!/usr/bin/env bash
# The CI test entry point — also directly runnable by any driver/agent.
# Runs the full suite on the virtual 8-device CPU mesh (conftest.py pins the
# platform) and fails fast on the first error.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q "$@"
