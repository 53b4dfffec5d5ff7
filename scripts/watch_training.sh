#!/usr/bin/env bash
# Colorized live tail of a training log (port of watch_training.sh).
# Usage: ./watch_training.sh [logs/<experiment>/training.log]
set -euo pipefail
LOG="${1:-$(ls -t logs/*/training.log 2>/dev/null | head -1 || true)}"
if [[ -z "${LOG}" || ! -f "${LOG}" ]]; then
  echo "No training.log found; pass a path." >&2
  exit 1
fi
echo "Watching ${LOG} (Ctrl-C to stop)"
tail -n 50 -f "$LOG" | while IFS= read -r line; do
  case "$line" in
    *Early\ stopping*|*error*|*Error*) printf '\033[31m%s\033[0m\n' "$line" ;;
    *val_abs_rel*) printf '\033[32m%s\033[0m\n' "$line" ;;
    *epoch*) printf '\033[36m%s\033[0m\n' "$line" ;;
    *) printf '%s\n' "$line" ;;
  esac
done
