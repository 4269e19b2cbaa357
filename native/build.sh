#!/bin/bash
# Build the native transforms library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    transforms.cpp -o libfgdm_transforms.so
echo "built $(pwd)/libfgdm_transforms.so"
