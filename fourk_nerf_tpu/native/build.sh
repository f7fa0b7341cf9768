#!/bin/sh
# Build the native grid-ops library. Produces libgridops.so next to this file.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libgridops.so gridops.cpp
echo "built $(pwd)/libgridops.so"
