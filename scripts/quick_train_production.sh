#!/usr/bin/env bash
# One-click production run: 480x640, batch 32, cosine LR, DP over all chips
# (port of quick_train_production.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python cli/train.py --config configs/train_config_production.yaml "$@"
