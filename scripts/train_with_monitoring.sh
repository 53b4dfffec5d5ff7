#!/usr/bin/env bash
# Launch training with TensorBoard + live log monitoring side-by-side
# (port of train_with_monitoring.sh; uses tmux panes instead of spawning
# terminal windows).
#
# Usage: ./train_with_monitoring.sh [--config C] [--experiment E] [...]
set -euo pipefail
cd "$(dirname "$0")/.."

CONFIG="configs/train_config.yaml"
EXPERIMENT_NAME="baseline_unet"
args=("$@")
for ((i = 0; i < ${#args[@]}; i++)); do
  case "${args[$i]}" in
    --config) CONFIG="${args[$((i + 1))]}" ;;
    --experiment) EXPERIMENT_NAME="${args[$((i + 1))]}" ;;
  esac
done

LOG_DIR=$(python - "$CONFIG" "$EXPERIMENT_NAME" <<'EOF'
import sys
from cadepth_tpu.config import load_config
cfg = load_config(sys.argv[1])
print(f"{cfg.logging.log_dir}/{sys.argv[2] if len(sys.argv) > 2 else cfg.experiment.name}")
EOF
)
mkdir -p "$LOG_DIR"

SESSION="cadepth_train"
if command -v tmux >/dev/null; then
  tmux kill-session -t "$SESSION" 2>/dev/null || true
  tmux new-session -d -s "$SESSION" "python cli/train.py $*"
  tmux split-window -t "$SESSION" -h \
    "python scripts/monitor_training.py $LOG_DIR/training.log"
  tmux split-window -t "$SESSION" -v \
    "tensorboard --logdir $LOG_DIR/tensorboard --port 6006 2>/dev/null || sleep infinity"
  echo "Attached monitoring session: tmux attach -t $SESSION"
  echo "TensorBoard: http://localhost:6006"
else
  echo "tmux not found; running training in the foreground."
  echo "Monitor with: python scripts/monitor_training.py $LOG_DIR/training.log"
  exec python cli/train.py "$@"
fi
