#!/usr/bin/env bash
# Full fast-suite invocation, sharded one pytest process per test directory.
#
# Rationale (VERDICT r4 weak #7): a single ~25-minute pytest process
# accumulates XLA-CPU compiler memory and segfaults inside
# backend_compile_and_load at ~96% of the suite; every implicated test
# passes in a fresh process.  Per-directory processes bound the compiler
# lifetime, keep the suite green, and parallelize trivially if wanted.
#
# Usage: scripts/run_test_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."

shards=(
  tests/config tests/core tests/fbs tests/features tests/native tests/ops
  tests/output tests/parallel tests/sensors tests/solvers tests/tracker
  "tests/test_sanity_checker.py tests/test_synthetic.py"
)

fail=0
for shard in "${shards[@]}"; do
  echo "== ${shard}"
  # shellcheck disable=SC2086
  python -m pytest ${shard} -q -m "not slow" "$@"
  rc=$?
  if [ $rc -ne 0 ]; then
    fail=$rc
  fi
done

exit $fail
