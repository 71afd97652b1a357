#!/bin/sh
# Build the native host sampler -> posegen_tpu/lib/libposegen_host.so
set -e
cd "$(dirname "$0")"
mkdir -p ../posegen_tpu/lib
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    host_sampler.cpp -o ../posegen_tpu/lib/libposegen_host.so
echo "built ../posegen_tpu/lib/libposegen_host.so"
