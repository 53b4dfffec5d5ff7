#!/usr/bin/env bash
# Interactive checkpoint picker + evaluation (port of evaluate.sh).
set -euo pipefail
cd "$(dirname "$0")/.."

CONFIG="${1:-configs/train_config.yaml}"
CKPT_ROOT="${2:-./checkpoints}"

mapfile -t CKPTS < <(find "$CKPT_ROOT" -maxdepth 2 -type d \
  \( -name "step_*" -o -name "best" \) 2>/dev/null | sort)
if [[ ${#CKPTS[@]} -eq 0 ]]; then
  echo "No checkpoints under $CKPT_ROOT" >&2
  exit 1
fi

echo "Available checkpoints:"
for i in "${!CKPTS[@]}"; do
  printf '  [%d] %s\n' "$i" "${CKPTS[$i]}"
done
read -r -p "Select checkpoint index [0-$((${#CKPTS[@]} - 1))]: " IDX
CKPT="${CKPTS[$IDX]}"

exec python cli/evaluate.py --checkpoint "$CKPT" --config "$CONFIG" \
  --output "./evaluation_results/$(basename "$(dirname "$CKPT")")_$(basename "$CKPT")"
