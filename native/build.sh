#!/bin/bash
# Build the native host-runtime library (ctypes-loaded; no pybind11 needed).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -std=c++17 \
    sixdof_native.cpp -o libsixdof_native.so
echo "built native/libsixdof_native.so"
