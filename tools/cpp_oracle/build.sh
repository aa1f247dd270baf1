#!/usr/bin/env bash
# Build the C++ oracle harness: the reference's UNMODIFIED solver sources
# (src/cilqr_solver.cpp, src/utils.cpp, src/cubic_spline.cpp) compiled
# against this directory's shim headers (mini-Eigen, fmt/spdlog stubs,
# no-op matplotlibcpp, yaml-less GlobalConfig). See README.md.
set -euo pipefail
cd "$(dirname "$0")"
REF="${REFERENCE_DIR:-/root/reference}"
[ -d "$REF/src" ] || { echo "reference not mounted at $REF" >&2; exit 3; }
mkdir -p build
CXX="${CXX:-g++}"
FLAGS="-std=c++17 -O2 -I include -I $REF/include"
$CXX $FLAGS -c "$REF/src/cubic_spline.cpp" -o build/cubic_spline.o
$CXX $FLAGS -c "$REF/src/utils.cpp" -o build/utils.o
$CXX $FLAGS -c "$REF/src/cilqr_solver.cpp" -o build/cilqr_solver.o
$CXX $FLAGS -c global_config_impl.cpp -o build/global_config.o
$CXX $FLAGS -c harness.cpp -o build/harness.o
$CXX build/cubic_spline.o build/utils.o build/cilqr_solver.o \
     build/global_config.o build/harness.o -o build/oracle_harness
echo "built build/oracle_harness"
