#!/usr/bin/env bash
# Environment setup & dependency checker (functional parity with the
# reference scripts/setup_environment.sh:1-335: OS detection, per-dependency
# version checks, collected missing-deps/warnings, installation
# instructions, and a final summary), adapted to this framework's stack
# (Python/JAX/TPU + optional C++ native loader instead of
# CMake/LibTorch/Eigen/OpenCV-C++).
set -uo pipefail
cd "$(dirname "$0")/.."

RED='\033[0;31m'; GREEN='\033[0;32m'; YELLOW='\033[1;33m'
BLUE='\033[0;34m'; NC='\033[0m'

echo -e "${BLUE}==================================================================="
echo -e "      cadepth_tpu (Camera-Aware Depth, TPU) - Environment Setup"
echo -e "===================================================================${NC}\n"

# -- OS detection ---------------------------------------------------------
OS="unknown"
case "$(uname -s)" in
    Linux*)  OS="linux" ;;
    Darwin*) OS="macos" ;;
esac
echo -e "Detected OS: ${GREEN}$OS $(uname -m)${NC}\n"

MISSING=()
WARNINGS=()

ok()   { echo -e "${GREEN}OK${NC}   $*"; }
warn() { echo -e "${YELLOW}--${NC}   $*"; WARNINGS+=("$*"); }
fail() { echo -e "${RED}FAIL${NC} $*"; MISSING+=("$1"); }

echo -e "${BLUE}Checking dependencies...${NC}\n"

# 1. Python >= 3.10
echo -n "Checking Python 3 (>= 3.10)... "
if command -v python >/dev/null; then
    PYVER=$(python -c 'import sys; print("%d.%d" % sys.version_info[:2])')
    if python -c 'import sys; sys.exit(0 if sys.version_info >= (3, 10) else 1)'; then
        ok "python $PYVER"
    else
        fail "python (found $PYVER, need >= 3.10)"
    fi
else
    fail "python"
fi

# 2. Python packages with minimum versions
check_pkg() {  # module [min_version] [pip-name]
    local mod="$1" minv="${2:-}" pipname="${3:-$1}"
    echo -n "Checking $pipname${minv:+ (>= $minv)}... "
    out=$(python - "$mod" "$minv" 2>&1 <<'EOF'
import importlib, sys
mod, minv = sys.argv[1], sys.argv[2]
m = importlib.import_module(mod)
ver = getattr(m, "__version__", "")
if minv and ver:
    def key(v):
        parts = []
        for tok in v.split(".")[:3]:
            digits = "".join(c for c in tok if c.isdigit())
            parts.append(int(digits or 0))
        return parts
    if key(ver) < key(minv):
        print(f"TOO_OLD {ver}")
        sys.exit(2)
print(ver or "?")
EOF
)
    rc=$?
    if [ $rc -eq 0 ]; then
        ok "$pipname $out"
    elif [ $rc -eq 2 ]; then
        fail "$pipname ($out, need >= $minv)"
    else
        fail "$pipname (not importable)"
    fi
}

check_pkg jax 0.4 jax
check_pkg flax 0.8 flax
check_pkg optax 0.1 optax
check_pkg orbax.checkpoint "" orbax-checkpoint
check_pkg numpy 1.24 numpy
check_pkg cv2 4.5 opencv-python
check_pkg yaml "" pyyaml
check_pkg tensorboard "" tensorboard
check_pkg scipy "" scipy

# 3. Accelerator
echo -n "Checking JAX backend/devices... "
DEVINFO=$(python - 2>/dev/null <<'EOF'
import jax
print(f"{jax.default_backend()} x{len(jax.devices())}")
EOF
)
if [ -n "$DEVINFO" ]; then
    case "$DEVINFO" in
        tpu*|axon*) ok "TPU detected: $DEVINFO" ;;
        *) warn "no TPU detected ($DEVINFO) — training runs but slowly" ;;
    esac
else
    fail "jax-device-init (jax.devices() failed)"
fi

# 4. Native toolchain (optional — C++ data loader)
echo -n "Checking C++ compiler (optional, native loader)... "
if command -v g++ >/dev/null; then
    ok "$(g++ --version | head -1)"
    if [ -f native/libcadepth_native.so ]; then
        ok "native loader built (native/libcadepth_native.so)"
    else
        warn "native loader not built — run native/build.sh for the fast host decode path"
    fi
else
    warn "g++ missing — native loader unavailable; the Python decode path still works"
fi

# 5. Dataset presence (optional)
echo -n "Checking dataset... "
if [ -d "data/sunrgbd" ] && [ -n "$(ls -A data/sunrgbd 2>/dev/null)" ]; then
    ok "data/sunrgbd present"
else
    warn "data/sunrgbd missing — scripts/download_sunrgbd.sh, or use the synthetic fixture for tests"
fi

# 6. Compilation cache
CACHE_DIR="${CADEPTH_XLA_CACHE:-$HOME/.cache/cadepth_tpu_xla}"
mkdir -p "$CACHE_DIR" 2>/dev/null && ok "XLA compilation cache at $CACHE_DIR" \
    || warn "could not create XLA cache dir $CACHE_DIR"

# -- installation instructions -------------------------------------------
if [ ${#MISSING[@]} -gt 0 ]; then
    echo ""
    echo -e "${RED}Missing dependencies:${NC}"
    for dep in "${MISSING[@]}"; do echo "  - $dep"; done
    echo ""
    echo -e "${YELLOW}Installation instructions:${NC}"
    echo "  pip install -U 'jax[tpu]' flax optax orbax-checkpoint \\"
    echo "      numpy opencv-python pyyaml tensorboard scipy"
    if [ "$OS" = "macos" ]; then
        echo "  (macOS has no TPU; use 'pip install -U jax' for CPU development)"
    fi
    echo ""
    echo -e "${YELLOW}After installing dependencies, run this script again to verify.${NC}"
fi

if [ ${#WARNINGS[@]} -gt 0 ]; then
    echo ""
    echo -e "${YELLOW}Warnings (${#WARNINGS[@]}):${NC}"
    for w in "${WARNINGS[@]}"; do echo "  - $w"; done
fi

echo ""
if [ ${#MISSING[@]} -eq 0 ]; then
    echo -e "${GREEN}=== Environment ready ===${NC}"
    echo "Next steps:"
    echo "  python -m pytest tests/ -q          # verify the install"
    echo "  scripts/download_sunrgbd.sh         # fetch the dataset"
    echo "  python cli/train.py --config configs/train_config.yaml"
    exit 0
else
    echo -e "${RED}=== ${#MISSING[@]} missing dependencies ===${NC}"
    exit 1
fi
