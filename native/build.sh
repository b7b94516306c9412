#!/bin/sh
# Build the native loader (auto-invoked by adaface_tpu/data/native_loader.py)
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O2 -shared -fPIC -std=c++17 adaface_loader.cpp \
    -o build/libadaface_loader.so -ljpeg -lpng -lz -pthread
echo "built build/libadaface_loader.so"
