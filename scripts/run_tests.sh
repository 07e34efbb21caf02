#!/usr/bin/env bash
# Warm-cache test split (VERDICT r3 #9).
#
# `python -m pytest tests/ -q` (the canonical gate) runs COLD (~45 min):
# full-suite runs with the persistent JAX compile cache enabled segfault
# nondeterministically inside XLA:CPU executable (de)serialization when
# torch + jax + native threads share one big process (see tests/conftest.py
# and CLAUDE.md). Small runs never crashed — so this script restores warm
# iteration by splitting the suite:
#
#   group A: the pure-JAX majority, ONE pytest process, cache ON
#   group B: the torch-differential files, one pytest process PER FILE,
#            cache ON (per-file processes are exactly the "small run"
#            regime that has never segfaulted)
#
# Usage: bash scripts/run_tests.sh          (from the repo root)
# Exit code is non-zero if any group fails.
set -u
cd "$(dirname "$0")/.."
export EDM_TESTS_JAX_CACHE=1

# Torch-differential tests (import torch or tests/reference_torch.py).
# Keep in sync with: grep -ln "import torch\|reference_torch" tests/*.py
TORCH_TESTS=(
  tests/test_convert_cli.py
  tests/test_convert_dac.py
  tests/test_convert_disc.py
  tests/test_convert_losses.py
  tests/test_convert_s2a.py
  tests/test_convert_t2s.py
  tests/test_export_cli.py
  tests/test_export_torch.py
  tests/test_gan_step_parity.py
  tests/test_hubert.py
  tests/test_masking_ops.py
  tests/test_ops_convolution.py
  tests/test_optim_parity.py
  tests/test_sampler_parity.py
  tests/test_spectral.py
  tests/test_train_loss_parity.py
  tests/test_train_trajectory_parity.py
)

ignore_flags=()
for f in "${TORCH_TESTS[@]}"; do
  ignore_flags+=("--ignore=$f")
done

fail=0

echo "== group A: pure-JAX suite (one process, warm cache) =="
python -m pytest tests/ -q "${ignore_flags[@]}" || fail=1

echo "== group B: torch-differential files (process per file, warm cache) =="
for f in "${TORCH_TESTS[@]}"; do
  echo "-- $f"
  python -m pytest "$f" -q || fail=1
done

if [ "$fail" -ne 0 ]; then
  echo "FAILED: at least one test group did not pass" >&2
fi
exit "$fail"
