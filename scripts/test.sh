#!/bin/bash
# Test runner (the "CI script" tests/conftest.py refers to).
#
#   scripts/test.sh            core pass  (pytest -m "not slow" — low minutes)
#   scripts/test.sh full       everything (the long tail included)
#   scripts/test.sh <pytest args...>   pass-through
#
# Wedge-proof: the tunneled-TPU (axon) sitecustomize can hang EVERY python
# at interpreter start when the relay is wedged; clearing PALLAS_AXON_POOL_IPS
# skips the plugin registration entirely and tests force the CPU backend
# anyway (tests/conftest.py).
set -euo pipefail
cd "$(dirname "$0")/.."

export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu

case "${1:-core}" in
  core) shift || true; time python -m pytest tests/ -q -m "not slow" "$@" ;;
  full) shift;         time python -m pytest tests/ -q "$@" ;;
  *)                   exec python -m pytest "$@" ;;
esac
