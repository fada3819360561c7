#!/bin/sh
# Build the native host-side kernel library.
set -e
cd "$(dirname "$0")"
g++ -O3 -fopenmp -shared -fPIC -std=c++17 -o libpci_native.so pci_native.cpp
echo "built $(pwd)/libpci_native.so"
