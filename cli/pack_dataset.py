#!/usr/bin/env python
"""Pack a SUN RGB-D tree into a decode-once memory-mapped cache.

TPU-native extension of the reference's offline precompute stage
(`preprocess_rays_main.cpp:20-130` precomputes ray grids; this
precomputes the whole decoded sample): every valid manifest image is
decoded + resized + K-rescaled ONCE into flat ``.npy`` arrays, and
training epochs then read samples at memcpy speed via
``cadepth_tpu.data.PackedSunRGBDLoader`` (augmentation and split
decisions stay read-time). See `cadepth_tpu/data/packed.py`.

Usage:
    python cli/pack_dataset.py --data-dir data/sunrgbd \\
        --manifest data/manifest/sunrgbd_manifest.json \\
        --out data/packed_240x320 --height 240 --width 320
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Pack dataset into npy memmaps")
    p.add_argument("--data-dir", required=True, help="SUN RGB-D root")
    p.add_argument("--manifest", required=True, help="sunrgbd_manifest.json")
    p.add_argument("--out", required=True, help="Output pack directory")
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "float16"),
                   help="Array dtype (float16 halves disk, ~1e-3 rel error)")
    p.add_argument("--sensors", default="kv1,kv2,realsense,xtion",
                   help="Comma-separated sensor filter")
    p.add_argument("--threads", type=int, default=8)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    from cadepth_tpu.data.packed import pack_dataset

    t0 = time.perf_counter()
    meta = pack_dataset(
        args.data_dir, args.manifest, args.out,
        target_height=args.height, target_width=args.width,
        dtype=args.dtype,
        allowed_sensors=[s.strip() for s in args.sensors.split(",") if s],
        num_threads=args.threads)
    elapsed = time.perf_counter() - t0
    n = meta["num_samples"]
    per_sample = (args.height * args.width * 4
                  * (4 if args.dtype == "float32" else 2))
    print(f"Packed {n} samples at {args.height}x{args.width} ({args.dtype}) "
          f"into {args.out} in {elapsed:.1f}s "
          f"(~{n * per_sample / 2**30:.2f} GiB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
