"""Device-resident data path: the whole dataset lives in HBM.

The classic TPU feeding pattern for datasets that fit on-chip: upload
the packed dataset ONCE, then every training batch is a device-side
gather (plus, optionally, on-device augmentation) inside one jitted
program. The only per-step host->device traffic is the (B,) int32
index vector — bytes, not megabytes. This sidesteps host decode, host
augmentation, AND the per-step H2D transfer entirely (on some runtimes
transfers serialize behind enqueued programs — see PERF_NOTES.md
"Fed-loop pathology").

Capacity: SUN RGB-D at 240x320 is ~1.2 MB/sample fp32 (~12 GB for all
10,335 images; ~6 GB as bf16 RGB; ~3.7 GB quantized u8-rgb/u16-depth)
— fits one v5e chip's 16 GB HBM next to the baseline model. 480x640
packs need sharding across a mesh, the chunk-rotating feed, or the
host pipeline.

On-device augmentation reproduces the host loader's semantics
(`sunrgbd.py _augment_sample/_resize_sample`, themselves parity with
`sunrgbd_loader.cpp:352-489`): random crop + resize-back (bilinear RGB
with the align_corners=False rule, nearest depth with the legacy
floor rule), horizontal flip, brightness/contrast jitter, with the
same camera-consistent intrinsics updates — including the reference's
crop-offset quirk (the `max(1, W-cw)+1` upper bound lets a full-size
crop start at 1 and get clamped). Randomness comes from
`jax.random.fold_in(seed, epoch) -> fold_in(index)` streams: the same
(seed, epoch, index) determinism contract as the host loader, but not
bit-identical draws (numpy PCG64 vs threefry).

Crop+flip+resize compile to per-sample interpolation-matrix GEMMs
(MXU), not gathers — the same trick as `ops/affine_warp.py`.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cadepth_tpu.data.sunrgbd import AugmentationConfig


def _k4(k: jax.Array) -> jax.Array:
    return jnp.stack([k[:, 0, 0], k[:, 1, 1], k[:, 0, 2], k[:, 1, 2]], -1)


# -- quantized HBM storage -------------------------------------------------
#
# rgb uint8 (x255) and depth uint16 (x1000, millimeters) are the DATASET'S
# OWN native encodings: SUN RGB-D ships 8-bit RGB and 16-bit mm-depth PNGs
# (sunrgbd_loader.cpp:221-259 decodes exactly these), so depth values that
# came through the pack's nearest-neighbor resize store their EXACT
# millimeter value (the fp32 materialization is within 1 ulp of the host
# loader's `mm / 1000.0` — XLA strength-reduces the jitted divide), and
# RGB is within 1/510 of the fp32 pack value (the only loss is the pack's
# bilinear first resize no longer being carried at fp32). 3.2x less HBM
# and 3.2x less H2D than fp32 storage; the jitted gather dequantizes to
# fp32 before augmentation, so all downstream math is unchanged.

_DEPTH_QUANT_SCALE = 1000.0    # meters -> millimeters
_DEPTH_QUANT_MAX = 65535.0 / _DEPTH_QUANT_SCALE


def _is_quant_rgb(dtype) -> bool:
    return np.dtype(dtype) == np.uint8


def _is_quant_depth(dtype) -> bool:
    return np.dtype(dtype) == np.uint16


def _host_encode_rgb(block: np.ndarray, out: np.ndarray) -> None:
    """fp pack rgb [0,1] -> uint8, round-half-up like the decode was."""
    b = np.asarray(block, np.float32) * 255.0
    np.rint(b, out=b)
    out[...] = b          # exact integers; cast is value-preserving


def _host_encode_depth(block: np.ndarray, out: np.ndarray) -> None:
    b = np.clip(np.asarray(block, np.float32), 0.0, _DEPTH_QUANT_MAX)
    b *= _DEPTH_QUANT_SCALE
    np.rint(b, out=b)
    out[...] = b


def _encode_rows(src, rows, dtype, encode, step: int = 64) -> np.ndarray:
    """Encode pack rows -> a compact quantized host array (init-time)."""
    n = len(rows)
    out = np.empty((n,) + src.shape[1:], dtype)
    for s in range(0, n, step):
        rs = list(rows[s:s + step])
        encode(src[rs], out[s:s + len(rs)])
    return out


def _decode_rgb(x: jax.Array) -> jax.Array:
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    return x.astype(jnp.float32)


def _decode_depth(x: jax.Array) -> jax.Array:
    if x.dtype == jnp.uint16:
        # divide (not reciprocal-multiply): bit-parity with the host
        # loaders' `depth_mm / 1000.0` (sunrgbd.py:212, dataloader.cpp)
        return x.astype(jnp.float32) / jnp.float32(_DEPTH_QUANT_SCALE)
    return x.astype(jnp.float32)


def _serial_h2d_default() -> bool:
    """True when the runtime is a tunneled device (axon): MB-scale H2D
    interleaved with enqueued programs collapses there (PERF_NOTES
    'chunk-rotating feed'), so chunk uploads must quiesce first."""
    import os

    plats = str(getattr(jax.config, "jax_platforms", "") or "")
    return "axon" in plats or "axon" in os.environ.get("JAX_PLATFORMS", "")


def serial_fed_fraction(compute_s_per_sample: float,
                        bytes_per_sample: float,
                        wire_bytes_per_s: float) -> float:
    """Steady-state fed fraction of the SERIAL chunk feed.

    With uploads strictly alternating with compute (``prefetch=
    "serial"``), each sample costs ``compute + bytes/wire`` wall
    seconds, so the fed loop runs at ``compute / (compute +
    bytes/wire)`` of the pure device step. This is the binding model
    for tunneled runtimes (PERF_NOTES 'the tunnel's true wire rate':
    13.6 ms/sample compute + 1.54 MB/sample quantized at ~55 MB/s
    caps the fed fraction at ~33%). Thread mode instead overlaps the
    two — its bound is ``min(1, compute / max(compute, bytes/wire))``
    per sample, i.e. fed-at-device-speed whenever the wire outpaces
    compute — asserted by the scheduling test
    ``test_chunked_thread_overlap_hides_upload``.
    """
    upload = bytes_per_sample / wire_bytes_per_s
    return compute_s_per_sample / (compute_s_per_sample + upload)


def _axis_matrices(out_size: int, crop0, crop_len, flip):
    """Per-sample (out, in) bilinear tent + nearest one-hot matrices for
    one axis of a crop->(flip)->resize-back composition.

    crop0/crop_len are traced floats (whole-valued); flip is a traced
    bool. Bilinear rule: src = clip((dst+0.5)*crop_len/out - 0.5,
    0, crop_len-1); nearest rule: src = min(floor(dst*crop_len/out),
    crop_len-1) — matching ops/resize.py (torch/cv2 conventions). A
    flip mirrors the position within the crop before the global offset.
    """
    dst = jnp.arange(out_size, dtype=jnp.float32)
    scale = crop_len / out_size
    # bilinear
    u = jnp.clip((dst + 0.5) * scale - 0.5, 0.0, crop_len - 1.0)
    u = jnp.where(flip, (crop_len - 1.0) - u, u)
    u = u + crop0
    lo = jnp.floor(u)
    w_hi = u - lo
    hi = jnp.minimum(lo + 1.0, out_size - 1.0)
    src = jnp.arange(out_size, dtype=jnp.float32)[None, :]
    tent = ((src == lo[:, None]) * (1.0 - w_hi)[:, None]
            + (src == hi[:, None]) * w_hi[:, None])
    # nearest
    n = jnp.minimum(jnp.floor(dst * scale), crop_len - 1.0)
    n = jnp.where(flip, (crop_len - 1.0) - n, n)
    n = n + crop0
    onehot = (src == n[:, None]).astype(jnp.float32)
    return tent.astype(jnp.float32), onehot


def _augment_one(rgb, depth, k, key, height, width, cfg: AugmentationConfig):
    """On-device equivalent of the host `_augment_sample` + resize-back
    tail for one sample. Returns (rgb, depth, k) at (height, width)."""
    k_scale, k_cx, k_cy, k_flip, k_b, k_c = jax.random.split(key, 6)
    h = jnp.float32(height)
    w = jnp.float32(width)

    if cfg.enable_random_crop:
        scale = jax.random.uniform(
            k_scale, (), jnp.float32, cfg.crop_scale_min, cfg.crop_scale_max)
        ch = jnp.floor(h * scale)
        cw = jnp.floor(w * scale)
        # host: integers(0, max(1, W-cw)+1) then slice-clamp (quirk kept)
        ux = jnp.floor(jax.random.uniform(k_cx, ())
                       * (jnp.maximum(1.0, w - cw) + 1.0))
        uy = jnp.floor(jax.random.uniform(k_cy, ())
                       * (jnp.maximum(1.0, h - ch) + 1.0))
        cw_eff = jnp.minimum(cw, w - ux)
        ch_eff = jnp.minimum(ch, h - uy)
    else:
        ux = uy = jnp.float32(0.0)
        cw_eff, ch_eff = w, h

    if cfg.enable_horizontal_flip:
        flip = jax.random.uniform(k_flip, ()) < cfg.horizontal_flip_prob
    else:
        flip = jnp.asarray(False)

    # jitter BEFORE the resample, as the host clips at crop resolution
    # (clip does not commute with interpolation)
    if cfg.enable_color_jitter:
        brightness = jax.random.uniform(
            k_b, (), jnp.float32,
            1.0 - cfg.brightness_delta, 1.0 + cfg.brightness_delta)
        contrast = jax.random.uniform(
            k_c, (), jnp.float32,
            1.0 - cfg.contrast_delta, 1.0 + cfg.contrast_delta)
        rgb = jnp.clip(rgb * contrast + brightness - 1.0, 0.0, 1.0)

    tent_w, near_w = _axis_matrices(width, ux, cw_eff, flip)
    tent_h, near_h = _axis_matrices(height, uy, ch_eff, jnp.asarray(False))
    # rows then columns; precision=highest keeps fp32 interpolation
    # exact on the MXU (ops/resize.py discipline)
    rgb = jnp.einsum("oh,hwc->owc", tent_h, rgb.astype(jnp.float32),
                     precision="highest")
    rgb = jnp.einsum("pw,owc->opc", tent_w, rgb, precision="highest")
    depth = jnp.einsum("oh,hwc->owc", near_h, depth.astype(jnp.float32),
                       precision="highest")
    depth = jnp.einsum("pw,owc->opc", near_w, depth, precision="highest")

    # camera-consistent K updates, in host order (crop -> flip -> resize)
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    cx = cx - ux
    cy = cy - uy
    cx = jnp.where(flip, cw_eff - cx - 1.0, cx)
    sx = w / cw_eff
    sy = h / ch_eff
    k = k.at[0, 0].set(fx * sx)
    k = k.at[1, 1].set(fy * sy)
    k = k.at[0, 2].set(cx * sx)
    k = k.at[1, 2].set(cy * sy)
    return rgb, depth, k


class DeviceDataset:
    """A packed split resident in device memory with jitted batching.

    Built from a :class:`~cadepth_tpu.data.packed.PackedSunRGBDLoader`
    whose target dims equal the pack dims (the pack already stores the
    post-first-resize state). Rays are never stored — batches follow
    the ``rays_on_device`` contract (the jitted train/eval steps derive
    the grid from K).
    """

    def __init__(self, loader, rgb_dtype=jnp.float32,
                 depth_dtype=jnp.float32, sharding=None,
                 mesh=None, mesh_axis: str = "data",
                 share_storage_from: Optional["DeviceDataset"] = None):
        if share_storage_from is not None:
            # Shared-storage construction: reuse another instance's HBM
            # buffers (one upload for train+val when the reference's
            # non-filtering split quirk makes their row lists coincide)
            # while keeping THIS split's identity — split name,
            # augmentation flags/config, and a fresh jitted gather bound
            # to this instance (so augment-time draws use this split's
            # aug_config, and attributes added later can never silently
            # alias across splits the way a __dict__ copy would).
            donor = share_storage_from
            rows = [s["row"] for s in loader.sample_paths]
            if rows != list(donor.rows):
                raise ValueError(
                    "share_storage_from requires identical sample rows "
                    f"(got {len(rows)} vs donor {len(donor.rows)})")
            if (loader.target_height, loader.target_width) != \
                    (donor.height, donor.width):
                raise ValueError(
                    "share_storage_from requires matching resolution "
                    f"({loader.target_height}x{loader.target_width} vs "
                    f"donor {donor.height}x{donor.width})")
            self.height, self.width = donor.height, donor.width
            self.aug_config = loader.aug_config
            self.augmentation_enabled = loader.augmentation_enabled
            self.split = loader.split
            self.rows = donor.rows
            self._sharding = donor._sharding
            self.mesh = donor.mesh
            self.mesh_axis = donor.mesh_axis
            self.n_shards = donor.n_shards
            self.shard_size = donor.shard_size
            self.rgb, self.depth, self.k = donor.rgb, donor.depth, donor.k
            if self.mesh is None:
                self._gather = jax.jit(self._make_batch,
                                       static_argnames=("augment",))
            else:
                self._gather = self._build_sharded_gather()
            return
        if (loader.target_height, loader.target_width) != \
                tuple(loader._rgb.shape[1:3]):
            raise ValueError(
                "DeviceDataset needs a pack at the target resolution "
                f"(pack {tuple(loader._rgb.shape[1:3])} vs target "
                f"({loader.target_height}, {loader.target_width})); "
                "re-pack with cli/pack_dataset.py --height/--width")
        rows = [s["row"] for s in loader.sample_paths]
        self.height = loader.target_height
        self.width = loader.target_width
        self.aug_config = loader.aug_config
        self.augmentation_enabled = loader.augmentation_enabled
        self.split = loader.split
        self.rows = tuple(rows)
        self._sharding = sharding
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if _is_quant_rgb(rgb_dtype):
            rgb = _encode_rows(loader._rgb, rows, np.uint8,
                               _host_encode_rgb)
        else:
            rgb = np.asarray(loader._rgb[rows]).astype(rgb_dtype)
        if _is_quant_depth(depth_dtype):
            depth = _encode_rows(loader._depth, rows, np.uint16,
                                 _host_encode_depth)
        else:
            depth = np.asarray(loader._depth[rows]).astype(depth_dtype)
        k = np.asarray(loader._intrinsics[rows], dtype=np.float32)
        if mesh is None:
            put = jax.device_put
            self.n_shards = 1
            self.shard_size = len(rows)
        else:
            # Sharded mode: each device along `mesh_axis` holds an equal
            # slice of the samples axis (pad by wraparound; the sampler
            # never draws pad rows). Multi-chip capacity scales linearly:
            # a 480x640 fp32 SUN RGB-D pack (~31 GB) is ~3.9 GB/chip on a
            # v5e-8 slice.
            from jax.sharding import NamedSharding, PartitionSpec

            self.n_shards = mesh.shape[mesh_axis]
            self.shard_size = -(-len(rows) // self.n_shards)
            pad = self.n_shards * self.shard_size - len(rows)
            if pad:
                sel = np.arange(pad) % len(rows)
                rgb = np.concatenate([rgb, rgb[sel]])
                depth = np.concatenate([depth, depth[sel]])
                k = np.concatenate([k, k[sel]])
            spec = PartitionSpec(mesh_axis)

            def put(arr):
                # make_array_from_callback materializes only the shards
                # addressable by THIS process — correct on multi-host
                # pods (every host reads the same pack and contributes
                # its devices' slices) and identical to a sharded
                # device_put in single-process runs.
                return jax.make_array_from_callback(
                    arr.shape, NamedSharding(mesh, spec),
                    lambda index: arr[index])
        self.rgb = put(rgb)
        self.depth = put(depth)
        self.k = put(k)
        if mesh is None:
            self._gather = jax.jit(self._make_batch,
                                   static_argnames=("augment",))
        else:
            self._gather = self._build_sharded_gather()

    def __len__(self) -> int:
        return len(self.rows)

    def nbytes(self) -> int:
        return self.rgb.nbytes + self.depth.nbytes + self.k.nbytes

    def batches_per_epoch(self, batch_size: int,
                          max_samples: Optional[int] = None,
                          drop_remainder: bool = True) -> int:
        n = len(self.rows)
        if max_samples is not None:
            n = min(n, max_samples)
        if self.mesh is None:
            return (n // batch_size if drop_remainder
                    else -(-n // batch_size))
        b_local = max(batch_size // self.n_shards, 1)
        valid_max = max(self._shard_valid_counts(n))
        return (valid_max // b_local if drop_remainder
                else -(-valid_max // b_local))

    def _shard_valid_counts(self, n_total: int) -> list:
        """Real (non-pad, within max_samples) sample count per shard."""
        S = self.shard_size
        return [max(0, min(n_total - d * S, S))
                for d in range(self.n_shards)]

    # -- jitted batch assembly ------------------------------------------

    def _make_batch(self, indices: jax.Array, epoch: jax.Array,
                    augment: bool) -> Dict[str, jax.Array]:
        rgb = _decode_rgb(jnp.take(self.rgb, indices, 0))
        depth = _decode_depth(jnp.take(self.depth, indices, 0))
        k = jnp.take(self.k, indices, 0)
        if augment:
            cfg = self.aug_config
            base = jax.random.fold_in(
                jax.random.PRNGKey(cfg.random_seed), epoch)
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(indices)
            rgb, depth, k = jax.vmap(
                functools.partial(_augment_one, height=self.height,
                                  width=self.width, cfg=cfg)
            )(rgb, depth, k, keys)
        batch = {"rgb": rgb, "depth": depth, "intrinsics": k, "k4": _k4(k)}
        if self._sharding is not None:
            sh = self._sharding
            batch = {key: jax.lax.with_sharding_constraint(
                v, sh.get(key) if isinstance(sh, dict) else sh)
                for key, v in batch.items()}
        return batch

    def _build_sharded_gather(self):
        """shard_map gather: each device takes its local index slice from
        its local dataset shard — no collectives, batch comes out sharded
        along the batch axis. Augmentation keys use the PADDED global row
        id (axis_index * shard_size + local index)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = self.mesh_axis
        shard_size = self.shard_size
        cfg = self.aug_config
        height, width = self.height, self.width

        def build(augment: bool):
            def local(rgb_s, depth_s, k_s, idx_l, epoch):
                rgb = _decode_rgb(jnp.take(rgb_s, idx_l, 0))
                depth = _decode_depth(jnp.take(depth_s, idx_l, 0))
                k = jnp.take(k_s, idx_l, 0)
                if augment:
                    gid = (jax.lax.axis_index(axis) * shard_size
                           + idx_l).astype(jnp.int32)
                    base = jax.random.fold_in(
                        jax.random.PRNGKey(cfg.random_seed), epoch[0])
                    keys = jax.vmap(
                        lambda i: jax.random.fold_in(base, i))(gid)
                    rgb, depth, k = jax.vmap(
                        functools.partial(_augment_one, height=height,
                                          width=width, cfg=cfg)
                    )(rgb, depth, k, keys)
                return {"rgb": rgb, "depth": depth, "intrinsics": k,
                        "k4": _k4(k)}

            return jax.jit(shard_map(
                local, mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
                out_specs=P(axis)))

        gathers = {False: None, True: None}

        def gather(indices, epoch, augment):
            if gathers[augment] is None:
                gathers[augment] = build(augment)
            return gathers[augment](self.rgb, self.depth, self.k, indices,
                                    jnp.reshape(epoch, (1,)))

        return gather

    # -- epoch iteration -------------------------------------------------

    def batches(self, batch_size: int, *, shuffle: bool = True,
                seed: int = 0, epoch: int = 0, augment: bool = False,
                drop_remainder: bool = True,
                max_samples: Optional[int] = None,
                ) -> Iterator[Dict[str, jax.Array]]:
        """One epoch of device batches; same ordering contract as
        InputPipeline (per-epoch reshuffle keyed on (seed, epoch)).

        ``drop_remainder=False`` pads the tail gather to the full batch
        size (one compiled gather shape) but yields the batch TRIMMED to
        its real samples — no sample is double-counted, at the cost of
        one extra downstream compile for the tail shape.

        Sharded mode samples each device's shard independently (order
        stratified by shard instead of globally mixed). The epoch length
        follows the LARGEST shard; shards holding fewer samples wrap
        around their permutation, repeating up to (max_shard - own)
        samples per epoch. With ``drop_remainder=False`` every real
        sample therefore appears at least once (with ``True``, the
        largest shard's tail is dropped like any pipeline remainder) —
        metrics sweeps should use the evaluator's exact trimmed sweep,
        not this iterator."""
        ep = jnp.int32(epoch)
        if self.mesh is not None:
            yield from self._sharded_batches(batch_size, shuffle, seed,
                                             epoch, augment,
                                             drop_remainder, max_samples)
            return
        n = len(self.rows)
        if max_samples is not None:
            n = min(n, max_samples)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng([seed, epoch]).shuffle(order)
        num = n // batch_size if drop_remainder else -(-n // batch_size)
        for b in range(num):
            idx = order[b * batch_size:(b + 1) * batch_size]
            valid = len(idx)
            if valid < batch_size:  # pad the gather, trim the outputs
                idx = np.concatenate([idx, order[:batch_size - valid]])
            batch = self._gather(jnp.asarray(idx, jnp.int32), ep,
                                 augment=augment)
            if valid < batch_size:
                batch = {k: v[:valid] for k, v in batch.items()}
            yield batch

    def _sharded_batches(self, batch_size, shuffle, seed, epoch, augment,
                         drop_remainder, max_samples):
        n_sh, S = self.n_shards, self.shard_size
        if batch_size % n_sh != 0:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"{n_sh} dataset shards")
        b_local = batch_size // n_sh
        n_total = len(self.rows)
        if max_samples is not None:
            n_total = min(n_total, max_samples)
        rng = np.random.default_rng([seed, epoch])
        perms = []
        for valid in self._shard_valid_counts(n_total):
            # shard d holds padded rows [d*S, (d+1)*S); exclude pad rows
            # (and rows beyond max_samples) from sampling. A shard left
            # empty by a max_samples debug limit falls back to its row 0
            # (pad rows are wraparound copies of real samples).
            perms.append(rng.permutation(valid) if shuffle and valid
                         else np.arange(max(valid, 1)))
        valid_max = max(len(p) for p in perms)
        num = (valid_max // b_local if drop_remainder
               else -(-valid_max // b_local))
        ep = jnp.int32(epoch)
        for t in range(num):
            # smaller shards (and the tail in non-drop mode) wrap around
            # their permutation so the gather stays full-shaped
            pos = np.arange(t * b_local, (t + 1) * b_local)
            idx = np.concatenate([p[pos % len(p)] for p in perms]
                                 ).astype(np.int32)
            yield self._gather(jnp.asarray(idx), ep, augment=augment)


class ChunkedDeviceDataset:
    """Chunk-rotating HBM feed for packs bigger than device memory.

    The fully-resident :class:`DeviceDataset` needs the whole pack in
    HBM (~31 GB for SUN RGB-D at 480x640 fp32 — more than one v5e's
    16 GB). This variant streams the pack through HBM in
    ``chunk_samples``-sample chunks with double buffering: while
    training gathers batches from chunk k, chunk k+1's rows are already
    uploading from the host pack on a background thread, so steady-state
    training still sees only device-side gathers (the per-step H2D is
    the index vector, and chunk uploads overlap compute where the
    runtime allows; see ``batches(prefetch=...)`` for runtimes where
    they don't). Quantized storage (``rgb_dtype=uint8`` +
    ``depth_dtype=uint16``) encodes this split ONCE into compact host
    copies and cuts both staging traffic and per-chunk H2D 3.2x — the
    recommended chunked setting (depth stored mm-exact, rgb within
    1/510).

    Epoch semantics are IDENTICAL to the resident path, not an
    approximation: each epoch draws one global permutation keyed on
    (seed, epoch) and cuts it into consecutive chunks, so every batch
    is the same slice of the same permutation the resident path would
    produce, every sample appears exactly once per epoch, and the
    augmentation keys use the same global-row fold_in streams —
    parity-tested bit-exact against :class:`DeviceDataset` in
    tests/test_device_resident.py.

    Single-device capacity tool; for multi-chip capacity use the
    sharded ``DeviceDataset(mesh=...)`` instead (mesh is rejected
    here). The two staging slots are owned by one iteration at a time:
    don't interleave two live ``batches()`` generators from the same
    instance.
    """

    def __init__(self, loader, chunk_samples: int,
                 rgb_dtype=jnp.float32, depth_dtype=jnp.float32,
                 sharding=None):
        if (loader.target_height, loader.target_width) != \
                tuple(loader._rgb.shape[1:3]):
            raise ValueError(
                "ChunkedDeviceDataset needs a pack at the target resolution "
                f"(pack {tuple(loader._rgb.shape[1:3])} vs target "
                f"({loader.target_height}, {loader.target_width}))")
        if chunk_samples < 1:
            raise ValueError("chunk_samples must be >= 1")
        self.height = loader.target_height
        self.width = loader.target_width
        self.aug_config = loader.aug_config
        self.augmentation_enabled = loader.augmentation_enabled
        self.split = loader.split
        self.rows = tuple(s["row"] for s in loader.sample_paths)
        self.chunk_samples = min(chunk_samples, len(self.rows))
        self._rgb_dtype = rgb_dtype
        self._depth_dtype = depth_dtype
        self._sharding = sharding
        # Host-side source arrays. Plain mode reads straight from the
        # pack views (memmap or preloaded RAM; zero extra host memory).
        # Quantized mode instead encodes this split's rows ONCE into
        # compact uint8/uint16 copies: +pack/3.2 host RAM buys 3.2x
        # less staging traffic AND 3.2x less H2D per chunk, every epoch.
        self._compact = (_is_quant_rgb(rgb_dtype)
                         and _is_quant_depth(depth_dtype))
        if _is_quant_rgb(rgb_dtype) != _is_quant_depth(depth_dtype):
            raise ValueError(
                "quantized chunked storage is all-or-nothing: use "
                "rgb_dtype=uint8 with depth_dtype=uint16")
        if self._compact:
            self._host_rgb = _encode_rows(loader._rgb, self.rows,
                                          np.uint8, _host_encode_rgb)
            self._host_depth = _encode_rows(loader._depth, self.rows,
                                            np.uint16, _host_encode_depth)
            self._host_k = np.asarray(
                loader._intrinsics[list(self.rows)], np.float32)
        else:
            self._host_rgb = loader._rgb
            self._host_depth = loader._depth
            self._host_k = loader._intrinsics
        self._gather = jax.jit(self._make_batch,
                               static_argnames=("augment",))
        # Zero-alloc double-buffered staging: two persistent host slots,
        # prefaulted once and reused for every chunk. Fresh pages on
        # some hosts fault in orders of magnitude slower than recycled
        # ones (measured ~6 MB/s first-touch vs ~1.2 GB/s reuse on the
        # bench container — proactive-reclaim daemons fight large fresh
        # allocations), so the producer must never allocate per chunk.
        # Capacity follows the EFFECTIVE chunk (batches() rounds the
        # chunk up to batch_size when batch_size > chunk_samples), so
        # allocation is lazy via _ensure_slots.
        self._slots = None
        self._slot_capacity = 0
        # device arrays produced from each slot; block on them before
        # the slot's host memory is overwritten (device_put is async)
        self._slot_inflight: list = [None, None]
        self._ensure_slots(self.chunk_samples)
        # On the CPU backend device_put ALIASES the numpy buffer
        # (zero-copy): block_until_ready is trivially true and pending
        # gathers read the slot's live memory, so reuse would corrupt
        # them (measured ~7% of chunks in tests). Real accelerators
        # copy to device memory during the transfer the inflight fence
        # waits on; only there is zero-alloc slot reuse sound.
        self._slot_alias_risk = jax.default_backend() not in ("tpu", "gpu")
        # Serial-mode fences, both forced with a device->host readback
        # (plain block_until_ready can return early on some runtimes —
        # that's exactly how transfers end up interleaved with steps):
        # _fence_fn drains the FIFO program queue BEFORE the transfer;
        # _xfer_fence proves the four chunk buffers have LANDED before
        # any gather/step program is allowed to follow them.
        self._fence_fn = jax.jit(lambda: jnp.zeros((8,), jnp.float32) + 1.0)
        self._xfer_fence = jax.jit(
            lambda r, d, k, g: (r.ravel()[0].astype(jnp.float32)
                                + d.ravel()[0].astype(jnp.float32)
                                + k.ravel()[0]
                                + g[0].astype(jnp.float32)))

    def _ensure_slots(self, capacity: int) -> None:
        """(Re)allocate the two staging slots to hold ``capacity``
        samples. No-op when already big enough; otherwise blocks any
        inflight transfers first (their host memory is being replaced)."""
        capacity = min(max(capacity, 1), len(self.rows))
        if self._slots is not None and self._slot_capacity >= capacity:
            return
        for infl in self._slot_inflight:
            if infl is not None:
                jax.block_until_ready(infl)
        self._slot_inflight = [None, None]
        c, h, w = capacity, self.height, self.width
        pack_dt = self._host_rgb.dtype

        def _slot():
            s = {
                "rgb": np.empty((c, h, w, 3), np.dtype(self._rgb_dtype)),
                "depth": np.empty((c, h, w, 1),
                                  np.dtype(self._depth_dtype)),
                "k": np.empty((c, 3, 3), np.float32),
                "gids": np.empty((c,), np.int32),
            }
            if np.dtype(self._rgb_dtype) != pack_dt:
                s["rgb_scratch"] = np.empty((c, h, w, 3), pack_dt)
            if np.dtype(self._depth_dtype) != self._host_depth.dtype:
                s["depth_scratch"] = np.empty((c, h, w, 1),
                                              self._host_depth.dtype)
            for a in s.values():
                a.fill(0)
            return s

        self._slots = [_slot(), _slot()]
        self._slot_capacity = c

    def __len__(self) -> int:
        return len(self.rows)

    def nbytes(self) -> int:
        """Per-buffer HBM footprint. Two chunks are resident while
        double-buffered (thread mode briefly pins a third while the
        producer waits to enqueue — budget ~2x plus one batch of gather
        outputs; serial mode holds exactly two)."""
        c = max(self.chunk_samples, self._slot_capacity)
        sample = (np.dtype(self._rgb_dtype).itemsize * 3
                  + np.dtype(self._depth_dtype).itemsize) \
            * self.height * self.width
        return c * (sample + 9 * 4)

    def batches_per_epoch(self, batch_size: int,
                          max_samples: Optional[int] = None,
                          drop_remainder: bool = True) -> int:
        n = len(self.rows)
        if max_samples is not None:
            n = min(n, max_samples)
        return n // batch_size if drop_remainder else -(-n // batch_size)

    # -- upload + jitted batch assembly ---------------------------------

    def _upload(self, order_slice: np.ndarray, slot: int = 0,
                block: bool = False) -> Dict[str, jax.Array]:
        """Assemble + device_put one chunk (prefetch thread or inline).

        ``order_slice`` holds global dataset positions (0..n-1); rows
        maps them to pack rows (compact quantized copies are already
        position-indexed). Returns device buffers plus the global ids
        the augmentation streams key on. The chunk is staged through
        persistent slot buffers (no per-chunk allocation); the previous
        transfer out of this slot is blocked on first, since
        ``device_put`` copies host memory asynchronously. ``block``
        additionally waits for THIS chunk's transfer (serial mode).
        """
        rows = (np.asarray(order_slice) if self._compact
                else np.asarray([self.rows[i] for i in order_slice]))
        n = len(rows)
        s = self._slots[slot]
        if self._slot_inflight[slot] is not None:
            jax.block_until_ready(self._slot_inflight[slot])

        def _stage(name, src, src_rows):
            dst = s[name][:n]
            scratch = s.get(f"{name}_scratch")
            if scratch is None:
                np.take(src, src_rows, axis=0, out=dst)
            else:
                np.take(src, src_rows, axis=0, out=scratch[:n])
                np.copyto(dst, scratch[:n], casting="unsafe")
            return dst

        rgb = _stage("rgb", self._host_rgb, rows)
        depth = _stage("depth", self._host_depth, rows)
        np.take(self._host_k, rows, axis=0, out=s["k"][:n])
        s["gids"][:n] = order_slice
        if block:
            # serial mode: quiesce the device BEFORE submitting the
            # transfer. On tunneled runtimes a transfer that merely
            # coexists with queued programs crawls ~30x regardless of
            # later arrivals; staging above overlapped the drain.
            np.asarray(self._fence_fn()).ravel()[0]
        put = (jax.device_put if self._sharding is None
               else functools.partial(jax.device_put,
                                      device=self._sharding))
        if self._slot_alias_risk:
            # private copies: the backend may alias host memory (see
            # __init__); slots still serve their page-recycling role
            prep = np.array
        else:
            def prep(x):
                return x
        out = {
            "rgb": put(prep(rgb)),
            "depth": put(prep(depth)),
            "k": put(prep(s["k"][:n])),
            "gids": put(prep(s["gids"][:n])),
        }
        self._slot_inflight[slot] = list(out.values())
        if block:
            # verified completion readback — see _xfer_fence in __init__
            np.asarray(self._xfer_fence(out["rgb"], out["depth"],
                                        out["k"], out["gids"])).ravel()
        return out

    def _make_batch(self, rgb_buf, depth_buf, k_buf, gid_buf,
                    idx: jax.Array, epoch: jax.Array,
                    augment: bool) -> Dict[str, jax.Array]:
        rgb = _decode_rgb(jnp.take(rgb_buf, idx, 0))
        depth = _decode_depth(jnp.take(depth_buf, idx, 0))
        k = jnp.take(k_buf, idx, 0)
        if augment:
            cfg = self.aug_config
            gids = jnp.take(gid_buf, idx, 0)
            base = jax.random.fold_in(
                jax.random.PRNGKey(cfg.random_seed), epoch)
            keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(gids)
            rgb, depth, k = jax.vmap(
                functools.partial(_augment_one, height=self.height,
                                  width=self.width, cfg=cfg)
            )(rgb, depth, k, keys)
        return {"rgb": rgb, "depth": depth, "intrinsics": k, "k4": _k4(k)}

    # -- epoch iteration -------------------------------------------------

    def batches(self, batch_size: int, *, shuffle: bool = True,
                seed: int = 0, epoch: int = 0, augment: bool = False,
                drop_remainder: bool = True,
                max_samples: Optional[int] = None,
                prefetch: str = "auto",
                ) -> Iterator[Dict[str, jax.Array]]:
        """Same contract (and identical sample stream) as
        ``DeviceDataset.batches``; see the class docstring.

        ``prefetch`` picks how chunk k+1 reaches the device:

        * ``"thread"`` — background-thread ``device_put`` overlapping
          chunk k's training (the right mode on real TPU hosts, where
          DMA proceeds alongside compute);
        * ``"serial"`` — inline upload at each chunk boundary, blocking
          until the transfer lands. On tunneled runtimes MB-scale
          transfers interleaved with arriving programs collapse ~30x
          (PERF_NOTES 'chunk-rotating feed'), so quiescing first is
          strictly faster there; the host-side staging still overlaps
          the previous chunk's queued steps.
        * ``"auto"`` — serial on tunneled (axon) runtimes, else thread.
        """
        import queue
        import threading

        if prefetch not in ("auto", "thread", "serial"):
            raise ValueError(f"prefetch must be auto|thread|serial, "
                             f"got {prefetch!r}")
        if prefetch == "auto":
            # operational override for runtimes the heuristic misreads
            import os

            prefetch = os.environ.get(
                "CADEPTH_CHUNK_PREFETCH",
                "serial" if _serial_h2d_default() else "thread")
            if prefetch not in ("thread", "serial"):
                raise ValueError(
                    f"CADEPTH_CHUNK_PREFETCH must be thread|serial, "
                    f"got {prefetch!r}")

        n = len(self.rows)
        if max_samples is not None:
            n = min(n, max_samples)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng([seed, epoch]).shuffle(order)
        # chunk boundary must not split a batch, or batch composition
        # would diverge from the resident path
        c = max(self.chunk_samples - self.chunk_samples % batch_size,
                batch_size)
        self._ensure_slots(c)   # batch_size may exceed chunk_samples
        chunk_slices = [order[s:s + c] for s in range(0, n, c)]

        ep = jnp.int32(epoch)
        total = (n // batch_size if drop_remainder
                 else -(-n // batch_size))
        state = {"emitted": 0}

        def chunk_batches(buf):
            c_len = int(buf["gids"].shape[0])
            num = c_len // batch_size
            tail = c_len % batch_size
            for b in range(num):
                if state["emitted"] >= total:
                    break
                idx = np.arange(b * batch_size, (b + 1) * batch_size)
                yield self._gather(buf["rgb"], buf["depth"], buf["k"],
                                   buf["gids"], jnp.asarray(idx, jnp.int32),
                                   ep, augment=augment)
                state["emitted"] += 1
            if tail and not drop_remainder and state["emitted"] < total:
                # pad the gather within the chunk, trim the outputs
                idx = np.concatenate([
                    np.arange(num * batch_size, c_len),
                    np.zeros(batch_size - tail, np.int64)])
                batch = self._gather(buf["rgb"], buf["depth"], buf["k"],
                                     buf["gids"],
                                     jnp.asarray(idx, jnp.int32),
                                     ep, augment=augment)
                yield {k: v[:tail] for k, v in batch.items()}
                state["emitted"] += 1

        if prefetch == "serial":
            for i, sl in enumerate(chunk_slices):
                buf = self._upload(sl, slot=i % 2, block=True)
                for batch in chunk_batches(buf):
                    yield batch
                    # drain after the consumer dispatched its step:
                    # keeping the tunnel's program queue shallow makes
                    # the chunk transfers 4-5x faster than async
                    # dispatch (PERF_NOTES wire-rate study)
                    np.asarray(self._fence_fn()).ravel()
            return

        q: "queue.Queue" = queue.Queue(maxsize=1)
        # cap live chunks at TWO (the documented HBM budget): the
        # producer may only upload chunk k+1 once the consumer has
        # finished chunk k-1 — without this token the producer uploads
        # k+2 while blocked on q.put and three chunks pin HBM at once
        tokens = threading.Semaphore(2)
        # Abandonment protocol: if the consumer leaves the generator
        # early (break / exception mid-epoch), the producer must not
        # stay blocked owning the shared staging slots — a later
        # batches() call would then race its uploads against the stuck
        # thread's writes. Every producer wait polls this event, and the
        # consumer's finally sets it, drains the queue, and JOINS the
        # producer, so generator exit returns the slots to the instance.
        stop = threading.Event()

        err: list = []

        def producer():
            try:
                for i, sl in enumerate(chunk_slices):
                    while not tokens.acquire(timeout=0.1):
                        if stop.is_set():
                            return
                    if stop.is_set():
                        return
                    buf = self._upload(sl, slot=i % 2)
                    while not stop.is_set():
                        try:
                            q.put(buf, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    else:
                        return
            except Exception as exc:  # noqa: BLE001 - re-raised by consumer
                err.append(exc)
            # sentinel (also after an error, to wake a blocked consumer)
            while not stop.is_set():
                try:
                    q.put(None, timeout=0.1)
                    break
                except queue.Full:
                    continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            buf = q.get()
            while buf is not None:
                yield from chunk_batches(buf)
                buf = None      # drop our reference before the release
                tokens.release()
                buf = q.get()
            if err:
                raise err[0]
        finally:
            stop.set()
            try:
                while True:     # unblock a producer stuck in q.put
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join()


class DevicePipeline:
    """InputPipeline-compatible facade over a :class:`DeviceDataset`
    (``__len__`` = batches/epoch, ``__iter__`` advances the epoch)."""

    def __init__(self, dataset: DeviceDataset, batch_size: int, *,
                 shuffle: bool, seed: int = 0,
                 max_samples: Optional[int] = None,
                 drop_remainder: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.max_samples = max_samples
        self.drop_remainder = drop_remainder
        self._epoch = 0

    def __len__(self) -> int:
        return self.dataset.batches_per_epoch(
            self.batch_size, self.max_samples, self.drop_remainder)

    def __iter__(self):
        augment = (self.dataset.augmentation_enabled
                   and self.dataset.split == "train")
        it = self.dataset.batches(
            self.batch_size, shuffle=self.shuffle, seed=self.seed,
            epoch=self._epoch, augment=augment,
            drop_remainder=self.drop_remainder,
            max_samples=self.max_samples)
        self._epoch += 1
        return it
