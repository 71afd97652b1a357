#!/bin/sh
# Build the native host sampler -> posegen_tpu/lib/libposegen_host.so
# (canonical source lives in posegen_tpu/csrc/ so wheel installs ship it;
# posegen_tpu.data.native.build_lib compiles the same file on demand).
set -e
cd "$(dirname "$0")"
mkdir -p ../posegen_tpu/lib
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    ../posegen_tpu/csrc/host_sampler.cpp -o ../posegen_tpu/lib/libposegen_host.so
echo "built ../posegen_tpu/lib/libposegen_host.so"
