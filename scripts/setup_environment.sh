#!/usr/bin/env bash
# Environment sanity checks (port of setup_environment.sh dep checks).
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== cadepth_tpu environment check ==="
fail=0

check_py() {
  python - "$1" <<'EOF'
import importlib, sys
mod = sys.argv[1]
try:
    m = importlib.import_module(mod)
    print(f"  OK   {mod} {getattr(m, '__version__', '')}")
except Exception as exc:
    print(f"  FAIL {mod}: {exc}")
    sys.exit(1)
EOF
}

for mod in jax flax optax orbax.checkpoint numpy cv2 yaml tensorboard; do
  check_py "$mod" || fail=1
done

python - <<'EOF' || fail=1
import jax
devs = jax.devices()
print(f"  OK   jax backend={jax.default_backend()} devices={devs}")
EOF

if command -v g++ >/dev/null; then
  echo "  OK   g++ $(g++ --version | head -1)"
  if [[ -f native/libcadepth_native.so ]]; then
    echo "  OK   native loader built"
  else
    echo "  --   native loader not built (run native/build.sh)"
  fi
else
  echo "  --   g++ missing (native loader unavailable; Python path still works)"
fi

[[ $fail -eq 0 ]] && echo "=== all checks passed ===" || echo "=== FAILURES above ==="
exit $fail
