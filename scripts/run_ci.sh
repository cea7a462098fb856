#!/usr/bin/env bash
# Committed verification tiers — the counterpart of the reference's
# pinned CI (.github/workflows/tests_bench.yml / code_coverage.yml).
#
#   scripts/run_ci.sh fast      ~10 min: ops / parity / trainer /
#                               contracts / device-cache / fused-sweep
#                               core (what a PR must keep green)
#   scripts/run_ci.sh default   ~50 min: the full suite
#                               (the 20-min shape-contract sweep included)
#   scripts/run_ci.sh slow      default + --runslow (~+25 min): converter
#                               numerics, 12-epoch curve parity, CLI sweeps
#
# All tiers force the 8-virtual-device CPU backend via tests/conftest.py;
# no TPU is touched (bench.py is the TPU entrypoint, run separately).
set -euo pipefail
cd "$(dirname "$0")/.."

TIER="${1:-fast}"
shift || true

FAST_TESTS=(
  tests/test_ops.py
  tests/test_property_ops.py
  tests/test_flows.py
  tests/test_datasets.py
  tests/test_trainer.py
  tests/test_device_cache.py
  tests/test_serving.py
  tests/test_masked_subset_encode.py
  tests/test_base_model_contracts.py
  tests/test_fused_sweeps.py
  tests/test_microbatch.py
  tests/test_docs.py
)

case "$TIER" in
  fast)
    exec python -m pytest "${FAST_TESTS[@]}" -q "$@"
    ;;
  default)
    exec python -m pytest tests/ -q "$@"
    ;;
  slow)
    exec python -m pytest tests/ -q --runslow "$@"
    ;;
  *)
    echo "usage: scripts/run_ci.sh [fast|default|slow] [pytest args...]" >&2
    exit 2
    ;;
esac
