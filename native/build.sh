#!/bin/sh
# Build the native IO runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    io_runtime.cpp -o libgfslam_io.so -lpng -lz -lpthread
echo "built $(pwd)/libgfslam_io.so"
