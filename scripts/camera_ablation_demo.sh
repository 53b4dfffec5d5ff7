#!/usr/bin/env bash
# Camera-awareness ablation: does intrinsics conditioning actually help?
#
# Trains baseline_unet (no camera input) vs intrinsics_unet (FiLM on K)
# on the PROJECTIVE synthetic benchmark: 3D objects of known physical
# sizes rendered through per-image intrinsics with focal lengths varying
# 0.6-1.6x. Apparent size = f*size/Z, so depth is ambiguous without K —
# the property the reference's camera-aware models exist to exploit.
#
# Measured on one v5e chip (2026-08-16):
#   baseline_unet     40 ep  val abs_rel 0.191   rmse 1.242
#   intrinsics_unet   40 ep  val abs_rel 0.128   rmse 0.768  (-33% / -38%)
#   geometry_aware    40 ep  val abs_rel 0.192 (under-trained at equal epochs)
#   geometry_aware   120 ep  best abs_rel 0.108  rmse 0.668  (best overall)
set -euo pipefail
cd "$(dirname "$0")/.."

WORKDIR="${1:-/tmp/cadepth_camera_ablation}"
mkdir -p "$WORKDIR"

python - "$WORKDIR" <<'EOF'
import sys
from cadepth_tpu.data import generate_synthetic_dataset
m = generate_synthetic_dataset(
    sys.argv[1], images_per_sensor=60, seed=11, projective=True,
    focal_range=(0.6, 1.6),
    sensor_specs={s: (128, 96, 128, 96)
                  for s in ("kv1", "kv2", "realsense", "xtion")})
print("manifest:", m)
EOF

for ARCH in baseline_unet intrinsics_unet; do
  cat > "$WORKDIR/cfg_$ARCH.yaml" <<EOF
experiment: {name: "cam_$ARCH", seed: 7}
data:
  data_dir: "$WORKDIR/sunrgbd"
  manifest_path: "$WORKDIR/sunrgbd_manifest.json"
  input_height: 96
  input_width: 128
  split_filtering: true
  compute_rays: true
  augmentation: {random_crop: false, horizontal_flip: true, color_jitter: false}
model: {architecture: "$ARCH", init_features: 16}
optimization: {optimizer: "adamw", learning_rate: 5.0e-4, lr_scheduler: "cosine", lr_warmup_epochs: 2}
training: {num_epochs: 40, batch_size: 16, num_workers: 4, log_interval: 10, num_vis_samples: 0}
checkpointing: {checkpoint_dir: "$WORKDIR/ckpts_$ARCH", save_interval: 20}
logging: {log_dir: "$WORKDIR/logs", tensorboard: {enabled: false}}
early_stopping: {enabled: false}
EOF
  python cli/train.py --config "$WORKDIR/cfg_$ARCH.yaml"
done

python - "$WORKDIR" <<'EOF'
import csv, sys
def final(name):
    rows = list(csv.DictReader(open(f"{sys.argv[1]}/logs/{name}/metrics.csv")))
    return float(rows[-1]["abs_rel"]), float(rows[-1]["rmse"])
base = final("cam_baseline_unet")
intr = final("cam_intrinsics_unet")
print(f"\nbaseline_unet    abs_rel {base[0]:.4f}  rmse {base[1]:.4f}")
print(f"intrinsics_unet  abs_rel {intr[0]:.4f}  rmse {intr[1]:.4f}")
improvement = (base[0] - intr[0]) / base[0] * 100
print(f"camera conditioning improvement: {improvement:+.1f}% abs_rel")
raise SystemExit(0 if intr[0] < base[0] else 1)
EOF
