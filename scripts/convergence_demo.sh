#!/usr/bin/env bash
# End-to-end quality demonstration: train baseline U-Net on the
# structured synthetic benchmark and verify it reaches the reference's
# "excellent" metric targets (abs_rel < 0.15, rmse < 0.50, delta1 > 0.85
# — README.md:769-775 of the reference).
#
# Measured on one v5e chip (2026-08-16): 40 epochs in ~12 min wall
# (~1.5 s/epoch after compile) reaching abs_rel 0.075, rmse 0.384,
# delta1 0.968, delta2 0.994, delta3 0.999.
# With DEVICE_RESIDENT=1 (2026-08-17): same protocol from the
# HBM-resident pack — abs_rel 0.0740, rmse 0.413, delta1 0.974, train
# epochs at 0.9 s (1.7x the host-fed epoch rate on this container).
#
# Usage: convergence_demo.sh [workdir] [arch]
#   arch: baseline_unet (default) | geometry_aware | intrinsics_unet | ...
set -euo pipefail
cd "$(dirname "$0")/.."

WORKDIR="${1:-/tmp/cadepth_convergence_demo}"
ARCH="${2:-baseline_unet}"
EPOCHS="${EPOCHS:-40}"
# DEVICE_RESIDENT=1: pack the set and train from the HBM-resident
# dataset (on-device gather + augmentation; zero per-step H2D).
DEVICE_RESIDENT="${DEVICE_RESIDENT:-0}"
# MODEL_EXTRA: extra inline-yaml model keys for experiment knobs, e.g.
#   MODEL_EXTRA=', norm: "group", decoder_upsample: "resize"'
MODEL_EXTRA="${MODEL_EXTRA:-}"
mkdir -p "$WORKDIR"

python - "$WORKDIR" <<'EOF'
import sys
from cadepth_tpu.data import generate_synthetic_dataset
root = sys.argv[1]
m = generate_synthetic_dataset(
    root, images_per_sensor=60, seed=9, structured=True,
    sensor_specs={s: (128, 96, 128, 96)
                  for s in ("kv1", "kv2", "realsense", "xtion")})
print("manifest:", m)
EOF

PACKED_KNOBS=""
if [[ "$DEVICE_RESIDENT" == "1" ]]; then
  python cli/pack_dataset.py --data-dir "$WORKDIR/sunrgbd" \
      --manifest "$WORKDIR/sunrgbd_manifest.json" \
      --out "$WORKDIR/packed" --height 96 --width 128
  PACKED_KNOBS="
  packed_dir: \"$WORKDIR/packed\"
  device_resident: true"
  # QUANT=1: store the HBM pack as rgb u8 / depth u16-mm (the round-3
  # quantized mode) so the convergence protocol also certifies it
  if [[ "${QUANT:-0}" == "1" ]]; then
    PACKED_KNOBS="$PACKED_KNOBS
  device_resident_dtype: \"quantized\""
  fi
fi

cat > "$WORKDIR/demo_config.yaml" <<EOF
experiment: {name: "convergence_demo_$ARCH", seed: 7}
data:
  data_dir: "$WORKDIR/sunrgbd"
  manifest_path: "$WORKDIR/sunrgbd_manifest.json"
  input_height: 96
  input_width: 128
  split_filtering: true
  compute_rays: true$PACKED_KNOBS
  augmentation: {random_crop: false, horizontal_flip: true, color_jitter: true}
model: {architecture: "$ARCH", init_features: 16$MODEL_EXTRA}
optimization:
  optimizer: "adamw"
  learning_rate: 5.0e-4
  lr_scheduler: "cosine"
  lr_warmup_epochs: 2
training: {num_epochs: $EPOCHS, batch_size: 16, num_workers: 4, log_interval: 5, num_vis_samples: 2}
checkpointing: {checkpoint_dir: "$WORKDIR/ckpts", save_interval: 10}
logging: {log_dir: "$WORKDIR/logs"}
early_stopping: {enabled: false}
EOF

# PLATFORM=cpu forces the jax platform (knob sanity runs on a busy-TPU
# host); leave unset for the recorded on-chip protocol.
python cli/train.py --config "$WORKDIR/demo_config.yaml" \
    ${PLATFORM:+--platform "$PLATFORM"}

DEMO_NAME="convergence_demo_$ARCH" python - "$WORKDIR" <<'EOF'
import csv, sys
import os
name = os.environ.get("DEMO_NAME", "convergence_demo_baseline_unet")
rows = list(csv.DictReader(open(f"{sys.argv[1]}/logs/{name}/metrics.csv")))
val = [r for r in rows if float(r["abs_rel"]) > 0]
best = min(val, key=lambda r: float(r["abs_rel"]))
last = rows[-1]
abs_rel, rmse, a1 = float(last["abs_rel"]), float(last["rmse"]), float(last["a1"])
print(f"\nFinal: abs_rel={abs_rel:.4f} rmse={rmse:.4f} delta1={a1:.4f}")
print(f"Best:  abs_rel={float(best['abs_rel']):.4f} @ epoch {int(float(best['epoch']))+1}")
ok = abs_rel < 0.15 and rmse < 0.50 and a1 > 0.85
print("QUALITY TARGETS (reference 'excellent' thresholds):",
      "PASSED" if ok else "FAILED")
raise SystemExit(0 if ok else 1)
EOF

# Camera-conditioned models: also assert the TRAINED network actually
# uses its conditioning (training-time analogue of the reference's
# conditioning test, tests/test_models.cpp:248-288).
if [[ "$ARCH" != "baseline_unet" ]]; then
  python scripts/probe_conditioning.py --config "$WORKDIR/demo_config.yaml" \
      --checkpoint latest ${PLATFORM:+--platform "$PLATFORM"}
fi
