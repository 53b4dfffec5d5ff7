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
    # Reorganized GitHub mirror (reference scripts/download_sunrgbd.sh:87-133):
    # clone the SUN_RGBD mirror repo and run its own fetch/extract script,
    # then move the organized tree into the target directory.
    MIRROR_REPO="${MIRROR_REPO:-https://github.com/chrischoy/SUN_RGBD.git}"
    if ! command -v git >/dev/null; then
      echo "ERROR: git is required for mirror mode" >&2
      exit 1
    fi
    WORK="$TARGET/.mirror"
    mkdir -p "$WORK"
    if [ -d "$WORK/SUN_RGBD/.git" ]; then
      echo "Mirror repo already cloned; pulling latest ..."
      git -C "$WORK/SUN_RGBD" pull --ff-only
    else
      echo "Cloning $MIRROR_REPO ..."
      git clone --depth 1 "$MIRROR_REPO" "$WORK/SUN_RGBD"
    fi
    if [ ! -f "$WORK/SUN_RGBD/download_and_extract.sh" ]; then
      echo "ERROR: mirror repo has no download_and_extract.sh — its layout" >&2
      echo "changed; download officially instead: $0 official $TARGET" >&2
      exit 1
    fi
    chmod +x "$WORK/SUN_RGBD/download_and_extract.sh"
    echo "Running the mirror's download_and_extract.sh (large download) ..."
    (cd "$WORK/SUN_RGBD" && ./download_and_extract.sh)
    echo "Moving organized data into $TARGET ..."
    if [ -d "$WORK/SUN_RGBD/SUNRGBD" ]; then
      cp -r "$WORK/SUN_RGBD/SUNRGBD/." "$TARGET/"
    else
      echo "ERROR: expected $WORK/SUN_RGBD/SUNRGBD after extraction" >&2
      exit 1
    fi
    echo "Done. Now run: python cli/validate_sunrgbd.py $TARGET"
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
