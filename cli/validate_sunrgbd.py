#!/usr/bin/env python
"""Dataset validation CLI.

Parity with the reference `./validate_sunrgbd <data_dir> <manifest>`
binary (`scripts/validate_sunrgbd.cpp:315-340`): walks the dataset,
prints the per-sensor summary, writes the manifest JSON.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    data_dir = argv[0] if len(argv) > 0 else "./data/sunrgbd"
    manifest_path = argv[1] if len(argv) > 1 else "./data/sunrgbd_manifest.json"

    from cadepth_tpu.data.manifest import (
        SunRGBDValidator,
        print_summary,
        save_manifest,
    )

    print("=== SUN RGB-D Data Validation Tool ===")
    print(f"Data directory: {data_dir}")
    print(f"Manifest output: {manifest_path}")

    validator = SunRGBDValidator(data_dir)
    results = validator.validate_all_images()
    print_summary(results)
    save_manifest(results, manifest_path)
    print("\n=== Validation complete ===")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
