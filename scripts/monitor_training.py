#!/usr/bin/env python
"""Live training monitor: colorized log tail + metrics dashboard.

Port of the reference's scripts/monitor_training.py (258 LoC): follows
training.log, and in --dashboard mode renders a refreshing summary from
metrics.csv (loss curve sparkline, best metrics, ETA).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time
from pathlib import Path

COLORS = {
    "cyan": "\033[36m", "green": "\033[32m", "red": "\033[31m",
    "yellow": "\033[33m", "bold": "\033[1m", "end": "\033[0m",
}

SPARK = "▁▂▃▄▅▆▇█"


def colorize(line: str) -> str:
    if "Early stopping" in line or "Error" in line or "error" in line:
        return f"{COLORS['red']}{line}{COLORS['end']}"
    if "val_abs_rel" in line:
        return f"{COLORS['green']}{line}{COLORS['end']}"
    if "epoch" in line:
        return f"{COLORS['cyan']}{line}{COLORS['end']}"
    return line


def sparkline(values, width=40):
    if not values:
        return ""
    tail = values[-width:]
    lo, hi = min(tail), max(tail)
    span = (hi - lo) or 1.0
    return "".join(SPARK[int((v - lo) / span * (len(SPARK) - 1))] for v in tail)


def read_metrics(csv_path: Path):
    rows = []
    if not csv_path.exists():
        return rows
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            try:
                rows.append({k: float(v) for k, v in row.items()})
            except (TypeError, ValueError):
                continue
    return rows


def dashboard(log_dir: Path, interval: float, log_lines: int = 15):
    while True:
        rows = read_metrics(log_dir / "metrics.csv")
        os.system("clear" if os.name != "nt" else "cls")
        print(f"{COLORS['bold']}=== cadepth_tpu training dashboard ==="
              f"{COLORS['end']}  ({log_dir})")
        if not rows:
            print("waiting for metrics.csv ...")
        else:
            losses = [r["train_loss"] for r in rows]
            last = rows[-1]
            print(f"epoch {int(last['epoch']) + 1}  step {int(last['step'])}"
                  f"  lr {last['learning_rate']:.2e}"
                  f"  elapsed {last['time_elapsed']:.0f}s")
            print(f"train_loss {last['train_loss']:.4f}  "
                  f"{COLORS['cyan']}{sparkline(losses)}{COLORS['end']}")
            val_rows = [r for r in rows if r.get("abs_rel", 0) > 0]
            if val_rows:
                best = min(val_rows, key=lambda r: r["abs_rel"])
                print(f"val abs_rel {val_rows[-1]['abs_rel']:.4f} "
                      f"(best {best['abs_rel']:.4f} @ epoch "
                      f"{int(best['epoch']) + 1})  "
                      f"rmse {val_rows[-1]['rmse']:.4f}  "
                      f"d1 {val_rows[-1]['a1']:.4f}")
            if len(rows) >= 2:
                per_epoch = (rows[-1]["time_elapsed"] - rows[0]["time_elapsed"]) \
                    / max(len(rows) - 1, 1)
                print(f"~{per_epoch:.0f}s/epoch")
        # recent-log pane (reference dashboard shows the last 20 log lines,
        # monitor_training.py:151-170)
        log_path = log_dir / "training.log"
        if log_lines and log_path.exists():
            print(f"\n{COLORS['bold']}recent logs:{COLORS['end']}")
            with open(log_path) as f:
                for line in f.readlines()[-log_lines:]:
                    print(colorize(line.rstrip()))
        print("\n(Ctrl-C to exit)")
        time.sleep(interval)


def follow(log_path: Path, lines: int = 30, keep_following: bool = True):
    with open(log_path) as f:
        # print existing tail
        for line in f.readlines()[-lines:]:
            print(colorize(line.rstrip()))
        if not keep_following:
            return
        while True:
            line = f.readline()
            if line:
                print(colorize(line.rstrip()), flush=True)
            else:
                time.sleep(0.5)


def main() -> int:
    p = argparse.ArgumentParser(description="Live training monitor")
    p.add_argument("target", nargs="?", default="",
                   help="training.log path or experiment log dir")
    p.add_argument("--dashboard", action="store_true",
                   help="metrics dashboard instead of log tail")
    p.add_argument("--interval", type=float, default=5.0)
    p.add_argument("--lines", type=int, default=30,
                   help="initial lines to print (tail mode) / log pane size")
    p.add_argument("--no-follow", action="store_true",
                   help="print the tail once and exit")
    args = p.parse_args()

    target = Path(args.target) if args.target else None
    if target is None:
        candidates = sorted(Path("logs").glob("*/training.log"),
                            key=lambda q: q.stat().st_mtime, reverse=True)
        if not candidates:
            print("No logs/*/training.log found", file=sys.stderr)
            return 1
        target = candidates[0]
    try:
        if args.dashboard or target.is_dir():
            dashboard(target if target.is_dir() else target.parent,
                      args.interval, log_lines=min(args.lines, 20))
        else:
            follow(target, lines=args.lines,
                   keep_following=not args.no_follow)
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
