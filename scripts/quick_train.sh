#!/usr/bin/env bash
# One-click default training run (port of quick_train_m4pro.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python cli/train.py --config configs/train_config.yaml "$@"
