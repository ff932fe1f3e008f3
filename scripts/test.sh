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

# Threaded-engine test modules (serving dispatcher threads compile in the
# background) run in a SEPARATE pytest process with the persistent compile
# cache disabled: jax's cache (de)serialization segfaults under compiles
# from background threads, and jax latches cache-enablement at the first
# compile, so only a process boundary isolates them (tests/conftest.py
# THREADED_ENGINE_FILES — keep this list in sync).
ENGINE_FILES="tests/test_serve.py tests/test_serve_kernel.py \
tests/test_serving_engine.py tests/test_serving_fuzz.py \
tests/test_serving_mesh.py tests/test_quantize.py \
tests/test_quantized_kernel.py tests/test_export_model.py"
IGNORES=$(for f in $ENGINE_FILES; do printf -- "--ignore=%s " "$f"; done)

run_split() {  # $1 = extra pytest args (e.g. -m "not slow")
  python -m pytest tests/ -q $IGNORES "$@" &&
  GIC_TEST_NO_CACHE=1 python -m pytest $ENGINE_FILES -q "$@"
}

run_split_concurrent() {  # round 5: MEASURED NEGATIVE on this 1-core box —
  # the engine process is compute-heavy (no-cache compiles), not
  # idle-dominated, so running it alongside the main pass roughly halves
  # both (first concurrent attempt tracked ~2× slower than serial and was
  # aborted).  Kept as `core-concurrent` for multi-core hosts, where the
  # process split parallelizes for real; `core` stays serial.
  GIC_TEST_NO_CACHE=1 python -m pytest $ENGINE_FILES -q "$@" \
      > /tmp/gic_engine_tests.log 2>&1 &
  local engine_pid=$!
  local rc=0
  python -m pytest tests/ -q $IGNORES "$@" || rc=$?
  local erc=0
  wait "$engine_pid" || erc=$?
  if [ "$erc" -ne 0 ]; then
    echo "--- engine-process output (rc=$erc) ---"
    tail -40 /tmp/gic_engine_tests.log
  else
    tail -2 /tmp/gic_engine_tests.log
  fi
  return $(( rc > erc ? rc : erc ))
}

run_cached() {  # ONE cached process, engine modules included — FAST BUT
  # NOT CRASH-SAFE: 3/3 clean at core scope (8m38-8m58 vs 13m04 split),
  # but the FULL suite segfaulted in a MAIN-THREAD cache read
  # (get_executable_and_time deserialization, test_full_reinforce) while
  # a serving _loop thread merely EXISTED idle — the round-4
  # "background-thread compiles" model was incomplete and the
  # thread-local opt-out does not make the process safe
  # (docs/artifacts/cache_segfault_r5/).  The process boundary remains
  # the only airtight isolation, so `core` stays on the split.
  GIC_TEST_CACHE_ANYWAY=1 python -m pytest tests/ -q "$@"
}

case "${1:-core}" in
  core) shift || true; time run_split -m "not slow" "$@" ;;
  core-cached) shift || true; time run_cached -m "not slow" "$@" ;;
  core-concurrent) shift || true; time run_split_concurrent -m "not slow" "$@" ;;
  full) shift;         time run_split "$@" ;;
  *)                   exec python -m pytest "$@" ;;
esac
