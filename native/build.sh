#!/usr/bin/env bash
# Build the native graphcore library. Requires g++ (baked in the image).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -o libgraphcore.so graphcore.cpp
echo "built $(pwd)/libgraphcore.so"
