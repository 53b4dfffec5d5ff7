#!/usr/bin/env python
"""Launch TensorBoard and open a browser (port of launch_tensorboard.py).

Usage: python scripts/launch_tensorboard.py [logdir] [--port N] [--no-browser]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
import webbrowser
from pathlib import Path


def main() -> int:
    p = argparse.ArgumentParser(description="Launch TensorBoard")
    p.add_argument("logdir", nargs="?", default="./logs")
    p.add_argument("--port", type=int, default=6006)
    p.add_argument("--no-browser", action="store_true")
    p.add_argument("--bind-all", action="store_true",
                   help="Serve on all interfaces (remote access)")
    args = p.parse_args()

    try:
        import tensorboard  # noqa: F401
    except ImportError:
        print("TensorBoard is not installed: pip install tensorboard",
              file=sys.stderr)
        return 1

    logdir = Path(args.logdir)
    if not logdir.exists():
        print(f"Log directory {logdir} does not exist", file=sys.stderr)
        return 1

    event_files = list(logdir.rglob("events.out.tfevents.*"))
    print(f"Found {len(event_files)} event file(s) under {logdir}")

    url = f"http://localhost:{args.port}"
    cmd = [sys.executable, "-m", "tensorboard.main",
           "--logdir", str(logdir), "--port", str(args.port)]
    if args.bind_all:
        cmd.append("--bind_all")
    proc = subprocess.Popen(cmd)
    print(f"TensorBoard starting on {url} (pid {proc.pid})")
    if not args.no_browser:
        time.sleep(3)
        try:
            webbrowser.open(url)
        except Exception:
            pass
    try:
        return proc.wait()
    except KeyboardInterrupt:
        proc.terminate()
        return 0


if __name__ == "__main__":
    raise SystemExit(main())
