#!/bin/sh
# Build libhgr_native.so (JPEG decode + batch staging thread pool).
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -march=native \
    hgr_native.cpp -o libhgr_native.so -ljpeg -lpthread
echo "built $(pwd)/libhgr_native.so"
