"""Synthetic SUN RGB-D fixture generator.

The reference has no hermetic data fixtures — its loader test requires
the real 10,335-image dataset on disk (`tests/test_dataloader.cpp`).
This generator builds a tiny fake SUN RGB-D tree (same directory layout,
file formats, and manifest schema) so every data-path test runs
anywhere, and benchmarks can synthesize arbitrary dataset sizes.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

_SENSOR_SPECS = {
    # sensor: (rgb_w, rgb_h, depth_w, depth_h) — kv2 mismatched like the
    # real dataset (manifest template: kv2 RGB 1920x1080, depth 512x424;
    # scaled down here for test speed).
    "kv1": (64, 48, 64, 48),
    "kv2": (96, 54, 64, 42),
    "realsense": (64, 48, 64, 48),
    "xtion": (64, 48, 64, 48),
}


def generate_synthetic_dataset(
    root: str,
    images_per_sensor: int = 2,
    seed: int = 0,
    sensors: tuple = ("kv1", "kv2", "realsense", "xtion"),
    with_rays: bool = False,
    with_extrinsics: bool = True,
    sensor_specs: Optional[Dict[str, tuple]] = None,
) -> str:
    """Create a fake SUN RGB-D tree + manifest under `root`.

    Layout per image dir (mirrors what `validate_sunrgbd.cpp` expects):
        <root>/sunrgbd/<sensor>/scene_<i>/{image/rgb.png, depth/depth.png,
        intrinsics.txt, scene.txt[, extrinsics/pose.txt][, rays.bin]}

    Returns the manifest path.
    """
    import cv2

    from cadepth_tpu.geometry.io import save_ray_directions

    rng = np.random.default_rng(seed)
    root_path = Path(root)
    data_dir = root_path / "sunrgbd"
    specs = dict(_SENSOR_SPECS)
    if sensor_specs:
        specs.update(sensor_specs)
    images = []
    sensor_counts: Dict[str, int] = {}
    for sensor in sensors:
        rgb_w, rgb_h, d_w, d_h = specs[sensor]
        for i in range(images_per_sensor):
            img_dir = data_dir / sensor / f"scene_{i:04d}"
            (img_dir / "image").mkdir(parents=True, exist_ok=True)
            (img_dir / "depth").mkdir(parents=True, exist_ok=True)

            rgb = rng.integers(0, 256, size=(rgb_h, rgb_w, 3), dtype=np.uint8)
            cv2.imwrite(str(img_dir / "image" / "rgb.png"), rgb)

            # 16-bit depth in millimeters, 500-9500mm plus some holes.
            depth_mm = rng.integers(500, 9500, size=(d_h, d_w)).astype(np.uint16)
            holes = rng.uniform(size=(d_h, d_w)) < 0.05
            depth_mm[holes] = 0
            cv2.imwrite(str(img_dir / "depth" / "depth.png"), depth_mm)

            fx = float(rng.uniform(0.8, 1.2)) * rgb_w
            fy = float(rng.uniform(0.8, 1.2)) * rgb_h
            cx, cy = rgb_w / 2.0, rgb_h / 2.0
            (img_dir / "intrinsics.txt").write_text(
                f"{fx} 0 {cx} 0 {fy} {cy} 0 0 1\n")
            (img_dir / "scene.txt").write_text("bedroom\n")

            if with_extrinsics:
                ext_dir = img_dir / "extrinsics"
                ext_dir.mkdir(exist_ok=True)
                theta = float(rng.uniform(-0.2, 0.2))
                rot = np.array(
                    [[np.cos(theta), -np.sin(theta), 0],
                     [np.sin(theta), np.cos(theta), 0],
                     [0, 0, 1]], dtype=np.float32)
                (ext_dir / "pose.txt").write_text(
                    "\n".join(" ".join(f"{v:.6f}" for v in row) for row in rot))

            if with_rays:
                k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
                u, v = np.meshgrid(np.arange(rgb_w), np.arange(rgb_h))
                x = (u - cx) / fx
                y = (v - cy) / fy
                z = np.ones_like(x)
                rays = np.stack([x, y, z], axis=-1)
                rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
                save_ray_directions(img_dir / "rays.bin", rays.astype(np.float32))

            sensor_counts[sensor] = sensor_counts.get(sensor, 0) + 1
            images.append({
                "path": str(img_dir),
                "sensor_type": sensor,
                "has_intrinsics": True,
                "has_rgb": True,
                "has_depth": True,
                "has_extrinsics": with_extrinsics,
                "has_scene_info": True,
                "rgb_resolution": [rgb_w, rgb_h],
                "depth_resolution": [d_w, d_h],
                "valid": True,
            })

    manifest = {
        "dataset": "SUN RGB-D V1 (synthetic fixture)",
        "total_images": len(images),
        "valid_images": len(images),
        "sensor_counts": sensor_counts,
        "images": images,
    }
    manifest_path = root_path / "sunrgbd_manifest.json"
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2)
    return str(manifest_path)
