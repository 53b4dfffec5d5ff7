"""Geometry: ray grids, intrinsics transforms, binary IO parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from cadepth_tpu.geometry import (
    ray_grid,
    ray_grid_batch,
    rays_to_world,
    ray_depth,
    k4_from_matrix,
    matrix_from_k4,
    normalize_k4,
    rescale_intrinsics,
    crop_intrinsics,
    hflip_intrinsics,
    invert_intrinsics,
    save_ray_directions,
    load_ray_directions,
    load_intrinsics_txt,
    load_pose_txt,
)

K = np.array([[520.0, 0.0, 320.5], [0.0, 515.0, 240.5], [0.0, 0.0, 1.0]], np.float32)


def reference_rays(k, h, w):
    """Direct port of the closed-form loop in ray_direction_computer.cpp:17-62."""
    out = np.zeros((h, w, 3), np.float32)
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    for v in range(h):
        for u in range(w):
            x = (u - cx) / fx
            y = (v - cy) / fy
            z = 1.0
            n = np.sqrt(x * x + y * y + z * z)
            out[v, u] = [x / n, y / n, z / n]
    return out


def test_ray_grid_matches_reference_formula():
    h, w = 24, 32
    got = np.asarray(ray_grid(jnp.asarray(K), h, w))
    want = reference_rays(K, h, w)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ray_grid_unit_norm():
    rays = np.asarray(ray_grid(jnp.asarray(K), 48, 64))
    norms = np.linalg.norm(rays, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_ray_grid_batch_varies_with_k():
    k2 = K.copy()
    k2[0, 0] = 800.0
    batch = np.stack([K, k2])
    rays = np.asarray(ray_grid_batch(jnp.asarray(batch), 16, 16))
    assert rays.shape == (2, 16, 16, 3)
    assert np.abs(rays[0] - rays[1]).max() > 1e-3


def test_rays_to_world_rotation():
    theta = 0.3
    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = [
        [np.cos(theta), -np.sin(theta), 0],
        [np.sin(theta), np.cos(theta), 0],
        [0, 0, 1],
    ]
    rays = np.asarray(ray_grid(jnp.asarray(K), 8, 8))
    world = np.asarray(rays_to_world(jnp.asarray(rays), jnp.asarray(rot)))
    want = rays @ rot[:3, :3].T
    np.testing.assert_allclose(world, want, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(world, axis=-1), 1.0, atol=1e-5)


def test_ray_depth_dot():
    ray = jnp.asarray([0.0, 0.0, 1.0])
    point = jnp.asarray([1.0, 2.0, 3.0])
    assert float(ray_depth(ray, point)) == pytest.approx(3.0)


def test_k4_roundtrip():
    k4 = np.asarray(k4_from_matrix(jnp.asarray(K)))
    np.testing.assert_allclose(k4, [520.0, 515.0, 320.5, 240.5])
    back = np.asarray(matrix_from_k4(jnp.asarray(k4)))
    np.testing.assert_allclose(back, K)


def test_normalize_k4_reference_rule():
    # intrinsics_unet.h:252-268: [fx/W, fy/H, 2cx/W-1, 2cy/H-1]
    k4 = jnp.asarray([[640.0, 480.0, 320.0, 240.0]])
    norm = np.asarray(normalize_k4(k4, width=640, height=480))
    np.testing.assert_allclose(norm, [[1.0, 1.0, 0.0, 0.0]], atol=1e-6)


def test_rescale_intrinsics():
    k = np.asarray(rescale_intrinsics(jnp.asarray(K), 0.5, 0.25))
    np.testing.assert_allclose(k[0, 0], 260.0)
    np.testing.assert_allclose(k[1, 1], 128.75)
    np.testing.assert_allclose(k[0, 2], 160.25)
    np.testing.assert_allclose(k[1, 2], 60.125)
    np.testing.assert_allclose(k[2, 2], 1.0)


def test_crop_and_flip_intrinsics():
    k = np.asarray(crop_intrinsics(jnp.asarray(K), 10.0, 20.0))
    np.testing.assert_allclose(k[0, 2], 310.5)
    np.testing.assert_allclose(k[1, 2], 220.5)
    kf = np.asarray(hflip_intrinsics(jnp.asarray(K), 640))
    np.testing.assert_allclose(kf[0, 2], 640 - 320.5 - 1)
    np.testing.assert_allclose(kf[1, 2], 240.5)


def test_invert_intrinsics():
    kinv = np.asarray(invert_intrinsics(jnp.asarray(K)))
    np.testing.assert_allclose(kinv @ K, np.eye(3), atol=1e-5)


def test_rays_bin_roundtrip(tmp_path):
    rays = np.random.default_rng(0).normal(size=(12, 16, 3)).astype(np.float32)
    path = tmp_path / "rays.bin"
    save_ray_directions(path, rays)
    loaded = load_ray_directions(path)
    np.testing.assert_array_equal(loaded, rays)
    # Binary layout: int32 H, int32 W, then floats (ray_direction_computer.h:96-99)
    raw = path.read_bytes()
    assert np.frombuffer(raw[:8], "<i4").tolist() == [12, 16]
    assert len(raw) == 8 + 12 * 16 * 3 * 4


def test_load_intrinsics_txt(tmp_path):
    p = tmp_path / "intrinsics.txt"
    p.write_text("520 0 320.5 0 515 240.5 0 0 1\n")
    k = load_intrinsics_txt(p)
    np.testing.assert_allclose(k, K)
    bad = tmp_path / "bad.txt"
    bad.write_text("-1 0 320.5 0 515 240.5 0 0 1\n")
    with pytest.raises(ValueError):
        load_intrinsics_txt(bad)


def test_load_pose_txt(tmp_path):
    p = tmp_path / "pose.txt"
    pose = np.eye(4, dtype=np.float32)
    p.write_text(" ".join(str(v) for v in pose.reshape(-1)))
    np.testing.assert_allclose(load_pose_txt(p), pose)
    bad = tmp_path / "badpose.txt"
    skew = np.eye(4)
    skew[0, 1] = 0.5
    bad.write_text(" ".join(str(v) for v in skew.reshape(-1)))
    with pytest.raises(ValueError):
        load_pose_txt(bad)
