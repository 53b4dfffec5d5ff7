#!/bin/bash
# Interactive evaluation launcher (functional parity with the reference
# scripts/evaluate.sh:1-329: checkpoint scanning + selection, config
# detection, visualization options, batch mode, results browsing), adapted
# to this framework's Orbax checkpoint layout (checkpoints/<exp>/step_*/ +
# best/ with .meta.json sidecars) and the python CLI.
#
# Non-interactive use: all prompts read defaults from flags/env, so
#   scripts/evaluate.sh --select 1 --num-vis 8 --yes < /dev/null
# runs end-to-end without a TTY.

set -e

RED='\033[0;31m'; GREEN='\033[0;32m'; YELLOW='\033[1;33m'
BLUE='\033[0;34m'; NC='\033[0m'

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
PROJECT_ROOT="$(dirname "$SCRIPT_DIR")"
RESULTS_DIR="${RESULTS_DIR:-$PROJECT_ROOT/results}"
CHECKPOINTS_DIR="${CHECKPOINTS_DIR:-$PROJECT_ROOT/checkpoints}"
CONFIGS_DIR="${CONFIGS_DIR:-$PROJECT_ROOT/configs}"
PYTHON="${PYTHON:-python}"

SELECT_ARG=""; NUM_VIS_ARG=""; COLORMAP_ARG=""; CONFIG_ARG=""
SAVE_PREDS_ARG=""; ASSUME_YES=0
while [ $# -gt 0 ]; do
    case "$1" in
        --select) SELECT_ARG="$2"; shift 2 ;;
        --num-vis) NUM_VIS_ARG="$2"; shift 2 ;;
        --colormap) COLORMAP_ARG="$2"; shift 2 ;;
        --config) CONFIG_ARG="$2"; shift 2 ;;
        --save-predictions) SAVE_PREDS_ARG="--save-predictions"; shift ;;
        --yes|-y) ASSUME_YES=1; shift ;;
        -h|--help)
            echo "Usage: $0 [--select N|all] [--config yaml] [--num-vis N]"
            echo "          [--colormap name] [--save-predictions] [--yes]"
            exit 0 ;;
        *) echo "Unknown flag: $1"; exit 1 ;;
    esac
done

ask() {  # ask <prompt> <default> -> echoes answer
    local prompt="$1" default="$2" ans=""
    if [ "$ASSUME_YES" = 1 ]; then echo "$default"; return; fi
    read -r -p "$prompt" ans || true
    echo "${ans:-$default}"
}

echo -e "${BLUE}==================================================================="
echo -e "     Camera-Aware Depth Estimation (cadepth_tpu) - Evaluation"
echo -e "===================================================================${NC}\n"

# -- prerequisites ------------------------------------------------------------
echo -e "${YELLOW}Checking prerequisites...${NC}"
if ! "$PYTHON" -c "import cadepth_tpu" 2>/dev/null; then
    if ! PYTHONPATH="$PROJECT_ROOT" "$PYTHON" -c "import cadepth_tpu" 2>/dev/null; then
        echo -e "${RED}Error: cadepth_tpu not importable${NC}"; exit 1
    fi
    export PYTHONPATH="$PROJECT_ROOT${PYTHONPATH:+:$PYTHONPATH}"
fi
DEVICES=$("$PYTHON" - <<'EOF' 2>/dev/null || echo "unknown"
import jax
print(f"{jax.default_backend()} x{len(jax.devices())}")
EOF
)
echo -e "${GREEN}JAX devices: $DEVICES${NC}\n"

# -- scan checkpoints ---------------------------------------------------------
echo -e "${YELLOW}Scanning for trained models under $CHECKPOINTS_DIR ...${NC}"
mapfile -t CKPTS < <(find "$CHECKPOINTS_DIR" -maxdepth 2 -mindepth 2 \
    -type d \( -name "step_*" -o -name "best" \) 2>/dev/null | sort)
if [ ${#CKPTS[@]} -eq 0 ]; then
    echo -e "${RED}Error: no checkpoints found in $CHECKPOINTS_DIR${NC}"
    echo "Train a model first: python cli/train.py --config <yaml>"
    exit 1
fi
echo -e "${GREEN}Found ${#CKPTS[@]} checkpoint(s)${NC}\n"

echo -e "${BLUE}Available Checkpoints:${NC}"
for i in "${!CKPTS[@]}"; do
    ckpt="${CKPTS[$i]}"
    exp=$(basename "$(dirname "$ckpt")")
    name=$(basename "$ckpt")
    size=$(du -sh "$ckpt" 2>/dev/null | cut -f1)
    meta="${ckpt%.}"; meta="$(dirname "$ckpt")/$(basename "$ckpt").meta.json"
    extra=""
    if [ -f "$meta" ]; then
        extra=$("$PYTHON" - "$meta" <<'EOF'
import json, sys
m = json.load(open(sys.argv[1]))
parts = [f"epoch {m.get('epoch', '?')}"]
ar = m.get("metrics", {}).get("abs_rel")
if ar is not None:
    parts.append(f"abs_rel {ar:.4f}")
print(", ".join(parts))
EOF
)
    fi
    echo -e "  ${GREEN}[$((i+1))]${NC} $exp/$name  (${size:-?}${extra:+, $extra})"
done
echo ""

choice="${SELECT_ARG:-$(ask "Select checkpoint number (or 'a' for all): " 1)}"
if [ "$choice" = "a" ] || [ "$choice" = "A" ] || [ "$choice" = "all" ]; then
    EVAL_MODE="batch"; SELECTED=("${CKPTS[@]}")
    echo -e "${GREEN}Selected: all checkpoints (batch mode)${NC}"
else
    EVAL_MODE="single"; idx=$((choice - 1))
    if [ $idx -lt 0 ] || [ $idx -ge ${#CKPTS[@]} ]; then
        echo -e "${RED}Error: invalid selection${NC}"; exit 1
    fi
    SELECTED=("${CKPTS[$idx]}")
    echo -e "${GREEN}Selected: ${CKPTS[$idx]}${NC}"
fi
echo ""

# -- config detection ---------------------------------------------------------
CONFIG_FILE="$CONFIG_ARG"
if [ -z "$CONFIG_FILE" ]; then
    for ckpt in "${SELECTED[@]}"; do
        exp=$(basename "$(dirname "$ckpt")")
        if [ -f "$CONFIGS_DIR/${exp}.yaml" ]; then
            CONFIG_FILE="$CONFIGS_DIR/${exp}.yaml"; break
        fi
    done
fi
if [ -z "$CONFIG_FILE" ]; then
    echo -e "${BLUE}Available configurations:${NC}"
    mapfile -t CONFIG_FILES < <(find "$CONFIGS_DIR" -name "*.yaml" | sort)
    for i in "${!CONFIG_FILES[@]}"; do
        echo -e "  ${GREEN}[$((i+1))]${NC} $(basename "${CONFIG_FILES[$i]}")"
    done
    cfg_choice=$(ask "Select configuration number: " 1)
    idx=$((cfg_choice - 1))
    [ $idx -ge 0 ] && [ $idx -lt ${#CONFIG_FILES[@]} ] || {
        echo -e "${RED}Error: invalid selection${NC}"; exit 1; }
    CONFIG_FILE="${CONFIG_FILES[$idx]}"
fi
echo -e "${GREEN}Using config: $CONFIG_FILE${NC}\n"

# -- options ------------------------------------------------------------------
num_vis="${NUM_VIS_ARG:-$(ask "Number of visualizations (default 50): " 50)}"
if [ -z "$COLORMAP_ARG" ]; then
    echo "Colormap options:"
    echo "  1) viridis  2) plasma  3) magma  4) inferno  5) turbo"
    cm=$(ask "Select colormap (1-5, default 1): " 1)
    case $cm in
        2) COLORMAP="plasma" ;; 3) COLORMAP="magma" ;;
        4) COLORMAP="inferno" ;; 5) COLORMAP="turbo" ;;
        *) COLORMAP="viridis" ;;
    esac
else
    COLORMAP="$COLORMAP_ARG"
fi
echo -e "${GREEN}Colormap: $COLORMAP${NC}"
if [ -z "$SAVE_PREDS_ARG" ] && [ "$ASSUME_YES" != 1 ]; then
    sp=$(ask "Save all depth predictions? (y/N): " n)
    [ "$sp" = "y" ] || [ "$sp" = "Y" ] && SAVE_PREDS_ARG="--save-predictions"
fi
echo ""

# -- run ----------------------------------------------------------------------
evaluate_checkpoint() {
    local ckpt=$1 out=$2
    echo -e "${YELLOW}Evaluating: $ckpt${NC}"
    "$PYTHON" "$PROJECT_ROOT/cli/evaluate.py" \
        --checkpoint "$ckpt" --config "$CONFIG_FILE" --output "$out" \
        --num-vis "$num_vis" --colormap "$COLORMAP" $SAVE_PREDS_ARG
}

SUCCESS=0; FAIL=0
for ckpt in "${SELECTED[@]}"; do
    exp=$(basename "$(dirname "$ckpt")")
    name=$(basename "$ckpt")
    out="$RESULTS_DIR/eval_${exp}_${name}"
    if evaluate_checkpoint "$ckpt" "$out"; then
        SUCCESS=$((SUCCESS+1))
        echo -e "${GREEN}✓ Results saved to $out${NC}"
        if [ "$EVAL_MODE" = "single" ] && [ -f "$out/report.txt" ]; then
            v=$(ask "View evaluation report? (Y/n): " Y)
            [ "$v" != "n" ] && [ "$v" != "N" ] && cat "$out/report.txt"
        fi
    else
        FAIL=$((FAIL+1))
        echo -e "${RED}✗ Evaluation failed for $ckpt${NC}"
    fi
done

echo ""
echo -e "${BLUE}=================== Evaluation Complete ===================${NC}"
echo -e "${GREEN}Successful: $SUCCESS${NC}"
[ $FAIL -gt 0 ] && echo -e "${RED}Failed: $FAIL${NC}"
echo "All results under: $RESULTS_DIR"

# -- offer comparison over accumulated results --------------------------------
mapfile -t EVAL_RESULTS < <(find "$RESULTS_DIR" -name "summary_metrics.csv" \
    -type f 2>/dev/null)
if [ ${#EVAL_RESULTS[@]} -gt 1 ]; then
    echo -e "${YELLOW}Found ${#EVAL_RESULTS[@]} evaluation results${NC}"
    rc=$(ask "Run comparison analysis? (Y/n): " n)
    if [ "$rc" != "n" ] && [ "$rc" != "N" ]; then
        "$PYTHON" "$PROJECT_ROOT/cli/compare_models.py" \
            --scan "$RESULTS_DIR" --output "$RESULTS_DIR/comparison"
    fi
fi
