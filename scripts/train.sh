#!/bin/bash
# Training launcher (parity with the reference scripts/train.sh:1-178:
# experiment-name dispatch, config/devices/debug/resume flags, device
# info, confirmation prompt, results pointer), adapted to the TPU CLI.
#
# Usage:
#   ./scripts/train.sh baseline_unet
#   ./scripts/train.sh geometry_aware_full --devices 8
#   ./scripts/train.sh intrinsics_only --debug
set -e

RED='\033[0;31m'; GREEN='\033[0;32m'; YELLOW='\033[1;33m'
BLUE='\033[0;34m'; NC='\033[0m'

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
PROJECT_ROOT="$(dirname "$SCRIPT_DIR")"
cd "$PROJECT_ROOT"

EXPERIMENT="baseline_unet"
CONFIG="configs/train_config.yaml"
DEVICES=""
DEBUG=false
RESUME=""
ASSUME_YES="${ASSUME_YES:-0}"

while [[ $# -gt 0 ]]; do
    case $1 in
        --config) CONFIG="$2"; shift 2 ;;
        --devices|--gpu) DEVICES="$2"; shift 2 ;;
        --debug) DEBUG=true; shift ;;
        --resume) RESUME="$2"; shift 2 ;;
        --yes|-y) ASSUME_YES=1; shift ;;
        -h|--help)
            echo "Usage: $0 [EXPERIMENT] [OPTIONS]"
            echo ""
            echo "Arguments:"
            echo "  EXPERIMENT       experiment override block from the config"
            echo "                   (default: baseline_unet)"
            echo ""
            echo "Options:"
            echo "  --config PATH    config file (default: configs/train_config.yaml)"
            echo "  --devices N      number of TPU devices (default: all)"
            echo "  --debug          debug mode (reduced dataset/epochs)"
            echo "  --resume PATH    resume from checkpoint ('latest' works)"
            echo "  --yes            skip the confirmation prompt"
            echo ""
            echo "Available experiments (configs/train_config.yaml):"
            python - "$CONFIG" <<'EOF' 2>/dev/null || true
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1]))
for name in (cfg.get("experiments") or {}):
    print(f"  {name}")
EOF
            exit 0 ;;
        *) EXPERIMENT="$1"; shift ;;
    esac
done

echo -e "${BLUE}==============================================================${NC}"
echo -e "${BLUE}   Camera-Aware Depth Estimation (TPU) - Training Launcher${NC}"
echo -e "${BLUE}==============================================================${NC}"
echo ""

if [ ! -f "$CONFIG" ]; then
    echo -e "${RED}Error: config file not found: $CONFIG${NC}"
    exit 1
fi

echo -e "${GREEN}Configuration:${NC}"
echo "  Experiment: $EXPERIMENT"
echo "  Config:     $CONFIG"
echo "  Devices:    ${DEVICES:-all}"
echo "  Debug:      $DEBUG"
[ -n "$RESUME" ] && echo "  Resume:     $RESUME"
echo ""

echo -e "${GREEN}Device information:${NC}"
python - <<'EOF' 2>/dev/null || echo -e "${YELLOW}  (could not query jax devices)${NC}"
import jax
print(f"  backend={jax.default_backend()} devices={len(jax.devices())}")
EOF
echo ""

mkdir -p checkpoints logs

CMD=(python cli/train.py --config "$CONFIG" --experiment "$EXPERIMENT")
[ "$DEBUG" = true ] && CMD+=(--debug)
[ -n "$RESUME" ] && CMD+=(--resume "$RESUME")
[ -n "$DEVICES" ] && CMD+=(--devices "$DEVICES")

echo -e "${BLUE}Executing:${NC}"
echo "  ${CMD[*]}"
echo ""

if [ "$ASSUME_YES" != 1 ]; then
    read -p "Start training? (y/n) " -n 1 -r || REPLY=y
    echo ""
    if [[ ! $REPLY =~ ^[Yy]$ ]]; then
        echo "Cancelled."
        exit 0
    fi
fi

echo ""
echo -e "${GREEN}Starting training...${NC}"
echo "=============================================================="
echo ""

"${CMD[@]}"
EXIT_CODE=$?

echo ""
echo "=============================================================="
if [ $EXIT_CODE -eq 0 ]; then
    echo -e "${GREEN}Training completed successfully!${NC}"
    echo ""
    echo "Results:"
    echo "  Checkpoints: checkpoints/$EXPERIMENT/"
    echo "  Logs:        logs/$EXPERIMENT/"
    echo ""
    echo "To evaluate the model, run:"
    echo "  ./scripts/evaluate.sh   # interactive picker"
    echo "  python cli/evaluate.py --checkpoint best --config $CONFIG --experiment $EXPERIMENT"
else
    echo -e "${RED}Training failed with exit code $EXIT_CODE${NC}"
    exit $EXIT_CODE
fi
