#!/bin/sh
# Build the native host-ops shared library.
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -march=native -fPIC -shared -o build/librpeflow_host.so host_ops.cpp
echo "built csrc/build/librpeflow_host.so"
