#!/usr/bin/env bash
# SUN RGB-D downloader — functional port of the reference's
# scripts/download_sunrgbd.sh (3 modes: official archive, reorganized
# mirror, manual skeleton).
#
# Usage: ./download_sunrgbd.sh [official|mirror|skeleton] [target_dir]
set -euo pipefail

MODE="${1:-official}"
TARGET="${2:-./data/sunrgbd}"
OFFICIAL_URL="https://rgbd.cs.princeton.edu/data/SUNRGBD.zip"
TOOLBOX_URL="https://rgbd.cs.princeton.edu/data/SUNRGBDtoolbox.zip"

fetch() {
  local url="$1" out="$2"
  if command -v wget >/dev/null; then
    wget -c -O "$out" "$url"
  elif command -v curl >/dev/null; then
    curl -L -C - -o "$out" "$url"
  else
    echo "ERROR: need wget or curl" >&2
    exit 1
  fi
}

mkdir -p "$TARGET"
case "$MODE" in
  official)
    echo "Downloading official SUN RGB-D (~19GB) to $TARGET ..."
    fetch "$OFFICIAL_URL" "$TARGET/SUNRGBD.zip"
    fetch "$TOOLBOX_URL" "$TARGET/SUNRGBDtoolbox.zip"
    echo "Extracting ..."
    (cd "$TARGET" && unzip -q SUNRGBD.zip && unzip -q SUNRGBDtoolbox.zip)
    echo "Done. Now run: python cli/validate_sunrgbd.py $TARGET"
    ;;
  mirror)
    echo "The reorganized GitHub mirror changes over time; see the dataset"
    echo "page at https://rgbd.cs.princeton.edu/ for current mirrors."
    exit 1
    ;;
  skeleton)
    echo "Creating a manual skeleton (drop image dirs under each sensor):"
    for sensor in kv1 kv2 realsense xtion; do
      mkdir -p "$TARGET/$sensor"
      echo "  $TARGET/$sensor/<scene>/{image/,depth/,intrinsics.txt[,scene.txt,extrinsics/]}"
    done
    echo "For hermetic tests/benchmarks use the synthetic generator instead:"
    echo "  python -c \"from cadepth_tpu.data import generate_synthetic_dataset as g; print(g('$TARGET-synth', images_per_sensor=8))\""
    ;;
  *)
    echo "Usage: $0 [official|mirror|skeleton] [target_dir]" >&2
    exit 1
    ;;
esac
