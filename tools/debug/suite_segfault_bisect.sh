#!/bin/bash
# Bisect the order-dependent XLA:CPU suite segfault
# (tools/results/suite_repro_r4.log: 138 tests pass, then SIGSEGV in
# backend_compile_and_load compiling apps/cilqr_demo.py:76 from
# tests/test_viz.py::test_cilqr_demo_cli_smoke; the file passes alone).
# Runs candidate file combinations in fresh interpreters, narrowing which
# prior compiler state detonates the crash. Run from a quiet box -- each
# combo is minutes of XLA:CPU compiles.
cd "$(dirname "$0")/../.."
set -x
run() { # name files...
  local name=$1; shift
  python -m pytest "$@" -q > tools/results/bisect_$name.log 2>&1
  echo "$name: rc=$? ($*)"
}
run sharding_viz tests/test_sharding.py tests/test_viz.py
run pallas_viz tests/test_pallas_kernel.py tests/test_viz.py
run pallas_sharding_viz tests/test_pallas_kernel.py tests/test_sharding.py tests/test_viz.py
echo DONE_BISECT
