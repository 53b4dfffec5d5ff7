#!/usr/bin/env bash
# Build the native data-pipeline library. Either:
#   ./build.sh            # direct g++ one-liner (fast)
#   ./build.sh cmake      # cmake + ninja build
set -euo pipefail
cd "$(dirname "$0")"

if [[ "${1:-}" == "cmake" ]]; then
  cmake -S . -B build -G Ninja
  cmake --build build
  cp build/libcadepth_native.so .
else
  g++ -O3 -march=native -std=c++17 -Wall -Wextra -shared -fPIC \
    -I/usr/include/opencv4 dataloader.cpp \
    -o libcadepth_native.so \
    -lopencv_core -lopencv_imgcodecs -lopencv_imgproc
fi
echo "built $(pwd)/libcadepth_native.so"
