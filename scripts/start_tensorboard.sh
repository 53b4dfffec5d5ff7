#!/usr/bin/env bash
# Start TensorBoard over the experiment log tree (port of start_tensorboard.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
LOGDIR="${1:-./logs}"
PORT="${2:-6006}"
echo "TensorBoard on http://localhost:$PORT (logdir $LOGDIR)"
exec tensorboard --logdir "$LOGDIR" --port "$PORT" --bind_all
