#!/bin/sh
# Build the native loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libmmst_loader.so loader.cpp -ljpeg -lpthread
echo "built $(pwd)/libmmst_loader.so"
