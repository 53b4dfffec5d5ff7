#!/usr/bin/env python
"""Ray-direction preprocessing CLI (format-parity tool).

Parity with the reference `./preprocess_rays --data_dir ...`
(`src/preprocessing/preprocess_rays_main.cpp:20-130`). On TPU rays are
derived on device per batch and never stored, so this CLI exists only
to produce reference-compatible `rays.bin` files for interop.

The ray grid itself is computed by the same jitted function the train
step uses (`cadepth_tpu.geometry.rays.ray_grid`) — one device launch per
unique intrinsics instead of the reference's per-scene CPU double loop.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Precompute rays.bin files")
    p.add_argument("--data_dir", required=True,
                   help="SUN RGB-D root (walks for intrinsics.txt)")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--native-resolution", action="store_true",
                   help="Use each image's native RGB resolution instead of "
                        "--height/--width")
    p.add_argument("--platform", default="",
                   help="Force a jax platform (e.g. 'cpu'); empty = default")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp

    from cadepth_tpu.geometry.io import load_intrinsics_txt, save_ray_directions
    from cadepth_tpu.geometry.rays import ray_grid

    root = Path(args.data_dir)
    image_dirs = sorted({p.parent for p in root.rglob("intrinsics.txt")})
    print(f"Found {len(image_dirs)} image directories under {root}")

    done = 0
    for image_dir in image_dirs:
        try:
            k = load_intrinsics_txt(image_dir / "intrinsics.txt")
        except ValueError as exc:
            print(f"  skip {image_dir}: {exc}", file=sys.stderr)
            continue
        h, w = args.height, args.width
        if args.native_resolution:
            import cv2

            rgb_dir = image_dir / "image"
            candidates = sorted(rgb_dir.glob("*")) if rgb_dir.is_dir() else []
            if candidates:
                img = cv2.imread(str(candidates[0]))
                if img is not None:
                    h, w = img.shape[:2]
        rays = np.asarray(ray_grid(jnp.asarray(k), h, w))
        save_ray_directions(image_dir / "rays.bin", rays)
        done += 1
        if done % 500 == 0:
            print(f"  {done}/{len(image_dirs)}")
    print(f"Wrote {done} rays.bin files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
