"""Full-model forward parity against torch-CPU oracles.

The reference is a LibTorch C++ stack; every cadepth_tpu model family is
a from-scratch flax re-implementation of its architecture. These tests
close the loop: each reference module structure is re-implemented here
in (Python) torch following the reference headers —
`baseline_unet.h`, `intrinsics_unet.h`, `geometry_aware_network.h`,
`film_layer.h`, `spatial_attention.h`, `pcl_layer.h` — the FLAX model's
initialized weights are ported into the torch oracle, and the two
forwards are compared numerically in fp32 train mode (batch-stat
BatchNorm everywhere, B > 1 so the FiLM BN branch is live).

What this certifies beyond the existing per-op oracles (resize /
grid_sample / pooling in test_ops.py): conv padding semantics,
ConvTranspose kernel/stride/flip conventions, BN train-mode statistics,
the decoder pad-fix and {skip, x} concat order, FiLM's B>1 BN gating,
the CBAM gate chain, PCL's pooled⊕K localization head + affine grid
construction, intrinsics normalization, and multi-scale ray pooling —
i.e. the full composed function of each model family computes what the
reference's LibTorch graph computes.

Weight-port conventions (verified exact against torch on CPU):
  * nn.Conv kernel (kh, kw, cin, cout)      -> Conv2d (cout, cin, kh, kw)
  * nn.ConvTranspose kernel (kh, kw, cin, cout), spatially FLIPPED
                                            -> ConvTranspose2d (cin, cout, kh, kw)
  * nn.Dense kernel (cin, cout)             -> Linear (cout, cin)

Known, documented reference quirks mirrored by both sides:
  * the geometry decoder's PCL accepts-and-ignores ray directions
    (`pcl_layer.h:76-111`, `geometry_aware_network.h:144-145`);
  * Perspective3DTransformer samples a displacement-only grid (no base
    identity grid, `pcl_layer.h:262-274`);
  * DepthSpatialAttention's dilated context conv uses dilation-2 "same"
    padding here — the reference's padding (`spatial_attention.h:221-226`,
    pad k/2 with dilation 2) shrinks the map by 2*(k/2) and its own
    torch::cat would throw; both implementations here use the working
    padding so the module is testable.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from cadepth_tpu.models.attention import (
    CBAM,
    CameraAwareSpatialAttention,
    DepthSpatialAttention,
)
from cadepth_tpu.models.baseline_unet import BaselineUNet
from cadepth_tpu.models.film import FiLMConvBlock, FiLMLayer
from cadepth_tpu.models.geometry_aware import (
    GeometryAwareNetwork,
    LightweightGeometryNetwork,
)
from cadepth_tpu.models.intrinsics_unet import (
    IntrinsicsAttentionUNet,
    IntrinsicsConditionedUNet,
)
from cadepth_tpu.models.pcl import (
    PerspectiveCorrectionLayer,
    Perspective3DTransformer,
)

torch.manual_seed(0)


# ---------------------------------------------------------------- weights

def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a, dtype=np.float32).copy())


def conv_w(k) -> torch.Tensor:
    """flax (kh, kw, cin, cout) -> torch Conv2d (cout, cin, kh, kw)."""
    return _t(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def convT_w(k) -> torch.Tensor:
    """flax ConvTranspose (kh, kw, cin, cout), spatially flipped ->
    torch ConvTranspose2d (cin, cout, kh, kw). lax.conv_transpose flips
    the kernel relative to torch's transposed-conv convention."""
    k = np.asarray(k)[::-1, ::-1].copy()
    return _t(np.transpose(k, (2, 3, 0, 1)))


def dense_w(k) -> torch.Tensor:
    return _t(np.asarray(k).T)


def load_conv(tc: tnn.Conv2d, p) -> None:
    with torch.no_grad():
        tc.weight.copy_(conv_w(p["kernel"]))
        if tc.bias is not None:
            tc.bias.copy_(_t(p["bias"]))


def load_convT(tc: tnn.ConvTranspose2d, p) -> None:
    with torch.no_grad():
        tc.weight.copy_(convT_w(p["kernel"]))
        if tc.bias is not None:
            tc.bias.copy_(_t(p["bias"]))


def load_dense(tl: tnn.Linear, p) -> None:
    with torch.no_grad():
        tl.weight.copy_(dense_w(p["kernel"]))
        tl.bias.copy_(_t(p["bias"]))


def load_bn(tb, p) -> None:
    with torch.no_grad():
        tb.weight.copy_(_t(p["scale"]))
        tb.bias.copy_(_t(p["bias"]))


def load_double_conv(tm, p) -> None:
    load_conv(tm.conv1, p["conv1"])
    load_bn(tm.bn1, p["bn1"])
    load_conv(tm.conv2, p["conv2"])
    load_bn(tm.bn2, p["bn2"])


def load_film(tm, p) -> None:
    load_dense(tm.fc1, p["fc1"])
    load_dense(tm.fc2, p["fc2"])
    load_dense(tm.fc_gamma, p["fc_gamma"])
    load_dense(tm.fc_beta, p["fc_beta"])
    load_bn(tm.bn1, p["bn1"])
    load_bn(tm.bn2, p["bn2"])


def load_film_double(tm, p) -> None:
    load_conv(tm.conv1, p["conv1"])
    load_bn(tm.bn1, p["bn1"])
    load_conv(tm.conv2, p["conv2"])
    load_bn(tm.bn2, p["bn2"])
    load_film(tm.film, p["film"])


def load_channel_att(tm, p) -> None:
    load_dense(tm.fc1, p["fc1"])
    load_dense(tm.fc2, p["fc2"])


def load_spatial_att(tm, p) -> None:
    # flax SpatialGateConv param "kernel" (k, k, 2, 1), no bias
    with torch.no_grad():
        tm.conv.weight.copy_(conv_w(p["conv"]["kernel"]))


def load_cbam(tm, p) -> None:
    load_channel_att(tm.ca, p["channel_attention"])
    load_spatial_att(tm.sa, p["spatial_attention"])


def load_pcl(tm, p) -> None:
    load_dense(tm.loc_fc1, p["loc_fc1"])
    load_dense(tm.loc_fc2, p["loc_fc2"])
    load_dense(tm.fc_transform, p["fc_transform"])


def load_rayconv(tm, p) -> None:
    load_conv(tm.conv1, p["conv1"])
    load_bn(tm.bn1, p["bn1"])
    load_conv(tm.conv2, p["conv2"])
    load_bn(tm.bn2, p["bn2"])
    load_film(tm.film, p["film"])


# ----------------------------------------------------------- torch oracles

class TDoubleConv(tnn.Module):
    """`baseline_unet.h:14-44`."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(x)))


def _pad_fix(x, skip):
    """`baseline_unet.h:88-95` decoder pad-fix."""
    dh = skip.shape[2] - x.shape[2]
    dw = skip.shape[3] - x.shape[3]
    if dh > 0 or dw > 0:
        x = F.pad(x, (dw // 2, dw - dw // 2, dh // 2, dh - dh // 2))
    return x


class TBaselineUNet(tnn.Module):
    """`baseline_unet.h:122-208`."""

    def __init__(self, f=8, max_depth=10.0):
        super().__init__()
        self.max_depth = max_depth
        self.enc1 = TDoubleConv(3, f)
        self.encs = tnn.ModuleList(
            [TDoubleConv(f * 2 ** i, f * 2 ** (i + 1)) for i in range(4)])
        self.ups = tnn.ModuleList(
            [tnn.ConvTranspose2d(f * 2 ** (i + 1), f * 2 ** i, 2, stride=2)
             for i in reversed(range(4))])
        self.decs = tnn.ModuleList(
            [TDoubleConv(f * 2 ** (i + 1), f * 2 ** i)
             for i in reversed(range(4))])
        self.out_conv = tnn.Conv2d(f, 1, 1)

    def forward(self, x):
        skips = [self.enc1(x)]
        for enc in self.encs[:-1]:
            skips.append(enc(F.max_pool2d(skips[-1], 2)))
        x = self.encs[-1](F.max_pool2d(skips[-1], 2))  # bottleneck
        for up, dec, skip in zip(self.ups, self.decs, reversed(skips)):
            x = _pad_fix(up(x), skip)
            x = dec(torch.cat([skip, x], 1))
        return torch.sigmoid(self.out_conv(x)) * self.max_depth


class TFiLM(tnn.Module):
    """`film_layer.h:26-132`."""

    def __init__(self, cdim, c, hidden=256):
        super().__init__()
        self.fc1 = tnn.Linear(cdim, 128)
        self.fc2 = tnn.Linear(128, hidden)
        self.fc_gamma = tnn.Linear(hidden, c)
        self.fc_beta = tnn.Linear(hidden, c)
        self.bn1 = tnn.BatchNorm1d(128)
        self.bn2 = tnn.BatchNorm1d(hidden)

    def forward(self, features, cam):
        h = self.fc1(cam)
        if h.shape[0] > 1:
            h = self.bn1(h)
        h = self.fc2(F.relu(h))
        if h.shape[0] > 1:
            h = self.bn2(h)
        h = F.relu(h)
        gamma = self.fc_gamma(h)[:, :, None, None]
        beta = self.fc_beta(h)[:, :, None, None]
        return gamma * features + beta


class TFiLMDoubleConv(tnn.Module):
    """`intrinsics_unet.h:16-53`: conv-bn-relu -> FiLM -> conv-bn-relu."""

    def __init__(self, cin, cout, cdim=4):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.film = TFiLM(cdim, cout)

    def forward(self, x, cam):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.film(x, cam)
        return F.relu(self.bn2(self.conv2(x)))


def _normalize_k4(k4, width, height):
    """`geometry_aware_network.h:366-382` / `intrinsics_unet.h:252-268`."""
    return torch.stack(
        [k4[:, 0] / width, k4[:, 1] / height,
         (k4[:, 2] / width) * 2.0 - 1.0,
         (k4[:, 3] / height) * 2.0 - 1.0], dim=-1)


class TIntrinsicsUNet(tnn.Module):
    """`intrinsics_unet.h:137-270` (+ CBAM decoders per `:278-385`)."""

    def __init__(self, f=8, max_depth=10.0, attention=False):
        super().__init__()
        self.max_depth = max_depth
        self.enc1 = TFiLMDoubleConv(3, f)
        self.encs = tnn.ModuleList(
            [TFiLMDoubleConv(f * 2 ** i, f * 2 ** (i + 1)) for i in range(4)])
        self.ups = tnn.ModuleList(
            [tnn.ConvTranspose2d(f * 2 ** (i + 1), f * 2 ** i, 2, stride=2)
             for i in reversed(range(4))])
        self.decs = tnn.ModuleList(
            [TFiLMDoubleConv(f * 2 ** (i + 1), f * 2 ** i)
             for i in reversed(range(4))])
        self.atts = tnn.ModuleList(
            [TCBAM(f * 2 ** i) for i in reversed(range(4))]) \
            if attention else None
        self.out_conv = tnn.Conv2d(f, 1, 1)

    def forward(self, x, k4):
        cam = _normalize_k4(k4, x.shape[3], x.shape[2])
        skips = [self.enc1(x, cam)]
        for enc in self.encs[:-1]:
            skips.append(enc(F.max_pool2d(skips[-1], 2), cam))
        x = self.encs[-1](F.max_pool2d(skips[-1], 2), cam)
        for i, (up, dec, skip) in enumerate(
                zip(self.ups, self.decs, reversed(skips))):
            x = _pad_fix(up(x), skip)
            x = dec(torch.cat([skip, x], 1), cam)
            if self.atts is not None:
                x = self.atts[i](x)
        return torch.sigmoid(self.out_conv(x)) * self.max_depth


class TChannelAtt(tnn.Module):
    """`spatial_attention.h:23-76`."""

    def __init__(self, c, reduction=16):
        super().__init__()
        r = max(c // reduction, 1)
        self.fc1 = tnn.Linear(c, r)
        self.fc2 = tnn.Linear(r, c)

    def forward(self, x):
        avg = self.fc2(F.relu(self.fc1(x.mean(dim=(2, 3)))))
        mx = self.fc2(F.relu(self.fc1(x.amax(dim=(2, 3)))))
        return torch.sigmoid(avg + mx)[:, :, None, None]


class TSpatialAtt(tnn.Module):
    """`spatial_attention.h:92-126`."""

    def __init__(self, k=7):
        super().__init__()
        self.conv = tnn.Conv2d(2, 1, k, padding=k // 2, bias=False)

    def forward(self, x):
        concat = torch.cat(
            [x.mean(dim=1, keepdim=True), x.amax(dim=1, keepdim=True)], 1)
        return torch.sigmoid(self.conv(concat))


class TCBAM(tnn.Module):
    """`spatial_attention.h:142-191`."""

    def __init__(self, c):
        super().__init__()
        self.ca = TChannelAtt(c)
        self.sa = TSpatialAtt()

    def forward(self, x):
        x = x * self.ca(x)
        return x * self.sa(x)


class TPCL(tnn.Module):
    """`pcl_layer.h:29-181` (forward path; rays accepted-but-ignored)."""

    def __init__(self, c, cdim=4, hidden=128):
        super().__init__()
        self.loc_fc1 = tnn.Linear(c + cdim, hidden)
        self.loc_fc2 = tnn.Linear(hidden, hidden)
        self.fc_transform = tnn.Linear(hidden, 6)

    def forward(self, x, cam):
        pooled = x.mean(dim=(2, 3))
        h = F.relu(self.loc_fc1(torch.cat([pooled, cam], 1)))
        h = F.relu(self.loc_fc2(h))
        p = self.fc_transform(h)
        cos_r, sin_r = torch.cos(p[:, 4]), torch.sin(p[:, 4])
        theta = torch.stack(
            [torch.stack([p[:, 0] * cos_r, -sin_r + p[:, 5], p[:, 2]], -1),
             torch.stack([sin_r, p[:, 1] * cos_r, p[:, 3]], -1)], 1)
        grid = F.affine_grid(theta, list(x.shape), align_corners=False)
        return F.grid_sample(x, grid, mode="bilinear",
                             padding_mode="zeros", align_corners=False)


class TRayConv(tnn.Module):
    """`geometry_aware_network.h:17-67`: conv-bn-relu -> FiLM -> conv-bn-relu."""

    def __init__(self, cin, cout, cdim=4, use_rays=False):
        super().__init__()
        total = cin + 3 if use_rays else cin
        self.conv1 = tnn.Conv2d(total, cout, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.film = TFiLM(cdim, cout)

    def forward(self, x, cam, rays=None):
        if rays is not None:
            x = torch.cat([x, rays], 1)
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.film(x, cam)
        return F.relu(self.bn2(self.conv2(x)))


class TGeoEncoder(tnn.Module):
    """`geometry_aware_network.h:74-105`."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TRayConv(cin, cout)
        self.att = TCBAM(cout)

    def forward(self, x, cam):
        return self.att(self.conv(F.max_pool2d(x, 2), cam))


class TGeoDecoder(tnn.Module):
    """`geometry_aware_network.h:112-170` — PCL on the upsampled features;
    rays are passed to the PCL and ignored (the reference quirk)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.up = tnn.ConvTranspose2d(cin, cout, 2, stride=2)
        self.pcl = TPCL(cout)
        self.conv = TRayConv(cin, cout)
        self.att = TCBAM(cout)

    def forward(self, x, skip, cam):
        x = self.pcl(self.up(x), cam)
        x = _pad_fix(x, skip)
        x = self.conv(torch.cat([skip, x], 1), cam)
        return self.att(x)


class TGeometryNet(tnn.Module):
    """`geometry_aware_network.h:201-394` (levels=5) / `:402-473` (4)."""

    def __init__(self, f=8, levels=5, max_depth=10.0):
        super().__init__()
        self.max_depth = max_depth
        self.levels = levels
        self.enc1 = TRayConv(3, f, use_rays=True)
        self.encs = tnn.ModuleList(
            [TGeoEncoder(f * 2 ** i, f * 2 ** (i + 1))
             for i in range(levels)])  # enc2.. + bottleneck
        self.decs = tnn.ModuleList(
            [TGeoDecoder(f * 2 ** (i + 1), f * 2 ** i)
             for i in reversed(range(levels))])
        self.out_conv = tnn.Conv2d(f, 1, 1)

    def forward(self, rgb, rays, k4):
        cam = _normalize_k4(k4, rgb.shape[3], rgb.shape[2])
        skips = [self.enc1(rgb, cam, rays)]
        for enc in self.encs[:-1]:
            skips.append(enc(skips[-1], cam))
        x = self.encs[-1](skips[-1], cam)
        for dec, skip in zip(self.decs, reversed(skips)):
            x = dec(x, skip, cam)
        return torch.sigmoid(self.out_conv(x)) * self.max_depth


def load_geo_encoder(tm, p):
    load_rayconv(tm.conv, p["conv"])
    load_cbam(tm.att, p["attention"])


def load_geo_decoder(tm, p):
    load_convT(tm.up, p["up"])
    load_pcl(tm.pcl, p["pcl"])
    load_rayconv(tm.conv, p["conv"])
    load_cbam(tm.att, p["attention"])


# ------------------------------------------------------------------ helpers

def nchw(a: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(a, -1, 1)))


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.moveaxis(t.detach().numpy(), 1, -1)


def jax_apply(model, *args, train_kw: bool = True):
    kw = {"train": True} if train_kw else {}
    variables = model.init(jax.random.PRNGKey(0), *args, **kw)
    out, _ = model.apply(variables, *args, **kw,
                         mutable=["batch_stats", "intermediates"])
    return np.asarray(out), variables["params"]


def param_count(tree) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree))


@pytest.fixture()
def inputs(rng):
    b, h, w = 2, 32, 64
    rgb = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
    rays = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    k4 = np.array([[60.0, 58.0, 33.0, 15.0],
                   [52.0, 55.0, 30.0, 17.0]], dtype=np.float32)
    return rgb, rays, k4


# -------------------------------------------------------------- layer tests

def test_film_layer_matches_torch(rng):
    feats = rng.standard_normal((2, 8, 12, 16)).astype(np.float32)
    cam = rng.standard_normal((2, 4)).astype(np.float32)
    m = FiLMLayer(16, dtype=jnp.float32)
    out, p = jax_apply(m, jnp.asarray(feats), jnp.asarray(cam))
    t = TFiLM(4, 16).train()
    load_film(t, p)
    want = to_nhwc(t(nchw(feats), torch.from_numpy(cam)))
    np.testing.assert_allclose(out, want, atol=1e-5, rtol=1e-5)


def test_film_conv_block_matches_torch(rng):
    feats = rng.standard_normal((2, 8, 12, 6)).astype(np.float32)
    cam = rng.standard_normal((2, 4)).astype(np.float32)
    m = FiLMConvBlock(16, dtype=jnp.float32)
    out, p = jax_apply(m, jnp.asarray(feats), jnp.asarray(cam))

    class TBlock(tnn.Module):  # `film_layer.h:140-169`
        def __init__(self):
            super().__init__()
            self.conv = tnn.Conv2d(6, 16, 3, padding=1, bias=False)
            self.bn = tnn.BatchNorm2d(16)
            self.film = TFiLM(4, 16)

        def forward(self, x, cam):
            return F.relu(self.film(self.bn(self.conv(x)), cam))

    t = TBlock().train()
    load_conv(t.conv, p["conv"])
    load_bn(t.bn, p["bn"])
    load_film(t.film, p["film"])
    want = to_nhwc(t(nchw(feats), torch.from_numpy(cam)))
    np.testing.assert_allclose(out, want, atol=1e-5, rtol=1e-5)


def test_cbam_matches_torch(rng):
    x = rng.standard_normal((2, 10, 14, 32)).astype(np.float32)
    m = CBAM(32, dtype=jnp.float32)
    out, p = jax_apply(m, jnp.asarray(x), train_kw=False)
    t = TCBAM(32).train()
    load_cbam(t, p)
    want = to_nhwc(t(nchw(x)))
    np.testing.assert_allclose(out, want, atol=1e-5, rtol=1e-5)


def test_pcl_matches_torch(rng):
    x = rng.standard_normal((2, 10, 14, 8)).astype(np.float32)
    cam = np.abs(rng.standard_normal((2, 4))).astype(np.float32)
    m = PerspectiveCorrectionLayer(8, warp_mode="gather", dtype=jnp.float32)
    out, p = jax_apply(m, jnp.asarray(x), jnp.asarray(cam))
    t = TPCL(8).train()
    load_pcl(t, p)
    want = to_nhwc(t(nchw(x), torch.from_numpy(cam)))
    np.testing.assert_allclose(out, want, atol=1e-5, rtol=1e-5)


def test_pcl_nonidentity_transform_matches_torch(rng):
    """Perturb fc_transform away from identity so the affine grid and the
    bilinear resample are exercised on a non-trivial warp."""
    x = rng.standard_normal((2, 10, 14, 8)).astype(np.float32)
    cam = np.abs(rng.standard_normal((2, 4))).astype(np.float32)
    m = PerspectiveCorrectionLayer(8, warp_mode="gather", dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(cam), train=True)
    p = jax.tree.map(np.asarray, variables["params"])
    p["fc_transform"]["kernel"] = (
        0.02 * rng.standard_normal(
            p["fc_transform"]["kernel"].shape)).astype(np.float32)
    p["fc_transform"]["bias"] = np.array(
        [0.9, 1.1, 0.05, -0.07, 0.1, 0.02], dtype=np.float32)
    out, _ = m.apply({"params": p}, jnp.asarray(x), jnp.asarray(cam),
                     train=True, mutable=["intermediates"])
    t = TPCL(8).train()
    load_pcl(t, p)
    want = to_nhwc(t(nchw(x), torch.from_numpy(cam)))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5, rtol=1e-5)


def test_depth_spatial_attention_matches_torch(rng):
    x = rng.standard_normal((2, 10, 14, 16)).astype(np.float32)
    m = DepthSpatialAttention(16, dtype=jnp.float32)
    out, p = jax_apply(m, jnp.asarray(x), train_kw=False)

    class TDepthAtt(tnn.Module):  # `spatial_attention.h:208-261`
        def __init__(self):
            super().__init__()
            self.base = TSpatialAtt()
            self.edge = tnn.Conv2d(16, 1, 3, padding=1, bias=False)
            # dilation-2 "same" padding (see module docstring: the
            # reference's pad=k/2 would shrink the map and crash its cat)
            self.context = tnn.Conv2d(16, 1, 7, padding=6, dilation=2,
                                      bias=False)
            self.fusion = tnn.Conv2d(3, 1, 1, bias=False)

        def forward(self, x):
            fused = torch.cat([self.base(x),
                               torch.sigmoid(self.edge(x)),
                               torch.sigmoid(self.context(x))], 1)
            return torch.sigmoid(self.fusion(fused))

    t = TDepthAtt().train()
    load_spatial_att(t.base, {"conv": {"kernel":
                                       p["base_attention"]["conv"]["kernel"]}})
    with torch.no_grad():
        t.edge.weight.copy_(conv_w(p["edge_conv"]["kernel"]))
        t.context.weight.copy_(conv_w(p["context_conv"]["kernel"]))
        t.fusion.weight.copy_(conv_w(p["fusion_conv"]["kernel"]))
    want = to_nhwc(t(nchw(x)))
    np.testing.assert_allclose(out, want, atol=1e-5, rtol=1e-5)


def test_camera_aware_attention_matches_torch(rng):
    x = rng.standard_normal((2, 10, 14, 16)).astype(np.float32)
    cam = rng.standard_normal((2, 4)).astype(np.float32)
    m = CameraAwareSpatialAttention(16, dtype=jnp.float32)
    out, p = jax_apply(m, jnp.asarray(x), jnp.asarray(cam),
                       train_kw=False)

    class TCamAtt(tnn.Module):  # `spatial_attention.h:272-330`
        def __init__(self):
            super().__init__()
            self.camera_fc = tnn.Linear(4, 16)
            self.spatial = tnn.Conv2d(2, 16, 7, padding=3, bias=False)
            self.fusion = tnn.Conv2d(32, 1, 1)

        def forward(self, x, cam):
            pooled = torch.cat([x.mean(dim=1, keepdim=True),
                                x.amax(dim=1, keepdim=True)], 1)
            spatial = self.spatial(pooled)
            cfeat = F.relu(self.camera_fc(cam))[:, :, None, None]
            cfeat = cfeat.expand(-1, -1, x.shape[2], x.shape[3])
            return torch.sigmoid(self.fusion(torch.cat([spatial, cfeat], 1)))

    t = TCamAtt().train()
    load_dense(t.camera_fc, p["camera_fc"])
    with torch.no_grad():
        t.spatial.weight.copy_(conv_w(p["spatial_conv"]["kernel"]))
        t.fusion.weight.copy_(conv_w(p["fusion_conv"]["kernel"]))
        t.fusion.bias.copy_(_t(p["fusion_conv"]["bias"]))
    want = to_nhwc(t(nchw(x), torch.from_numpy(cam)))
    np.testing.assert_allclose(out, want, atol=1e-5, rtol=1e-5)


def test_perspective3d_transformer_matches_torch(rng):
    x = rng.standard_normal((2, 10, 14, 8)).astype(np.float32)
    rays = rng.standard_normal((2, 10, 14, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    cam = np.abs(rng.standard_normal((2, 4))).astype(np.float32)
    m = Perspective3DTransformer(8, dtype=jnp.float32)
    out, p = jax_apply(m, jnp.asarray(x), jnp.asarray(cam), jnp.asarray(rays))

    class TP3D(tnn.Module):  # `pcl_layer.h:193-279`
        def __init__(self):
            super().__init__()
            self.depth_pred = tnn.Conv2d(8, 1, 1)
            self.loc_fc1 = tnn.Linear(8 + 4, 128)
            self.loc_fc2 = tnn.Linear(128, 3)

        def forward(self, x, cam, rays):
            off = torch.tanh(self.depth_pred(x))
            pooled = x.mean(dim=(2, 3))
            h = F.relu(self.loc_fc1(torch.cat([pooled, cam], 1)))
            tr = self.loc_fc2(h)
            dx = off * rays[:, 0:1] + tr[:, 0].view(-1, 1, 1, 1)
            dy = off * rays[:, 1:2] + tr[:, 1].view(-1, 1, 1, 1)
            # displacement-only grid — the reference quirk
            grid = torch.stack([(dx / (x.shape[3] / 2.0)).squeeze(1),
                                (dy / (x.shape[2] / 2.0)).squeeze(1)], -1)
            return F.grid_sample(x, grid, mode="bilinear",
                                 padding_mode="border", align_corners=True)

    t = TP3D().train()
    with torch.no_grad():
        t.depth_pred.weight.copy_(conv_w(p["depth_pred"]["kernel"]))
        t.depth_pred.bias.copy_(_t(p["depth_pred"]["bias"]))
    load_dense(t.loc_fc1, p["loc_fc1"])
    load_dense(t.loc_fc2, p["loc_fc2"])
    want = to_nhwc(t(nchw(x), torch.from_numpy(cam), nchw(rays)))
    np.testing.assert_allclose(out, want, atol=1e-5, rtol=1e-5)


# -------------------------------------------------------------- model tests

def _load_baseline(t: TBaselineUNet, p) -> None:
    load_double_conv(t.enc1, p["enc1"])
    for i, name in enumerate(["enc2", "enc3", "enc4", "bottleneck"]):
        load_double_conv(t.encs[i], p[name]["conv"])
    for i, name in enumerate(["dec4", "dec3", "dec2", "dec1"]):
        load_convT(t.ups[i], p[name]["up"])
        load_double_conv(t.decs[i], p[name]["conv"])
    load_conv(t.out_conv, p["out_conv"])


def test_baseline_unet_matches_torch(inputs):
    rgb, _, _ = inputs
    model = BaselineUNet(init_features=8, dtype=jnp.float32)
    out, p = jax_apply(model, jnp.asarray(rgb))
    t = TBaselineUNet(f=8).train()
    _load_baseline(t, p)
    want = to_nhwc(t(nchw(rgb)))
    assert param_count(p) == sum(q.numel() for q in t.parameters())
    np.testing.assert_allclose(out, want, atol=3e-3, rtol=1e-3)


def _load_intrinsics(t: TIntrinsicsUNet, p) -> None:
    load_film_double(t.enc1, p["enc1"])
    for i, name in enumerate(["enc2", "enc3", "enc4", "bottleneck"]):
        load_film_double(t.encs[i], p[name]["conv"])
    for i, name in enumerate(["dec4", "dec3", "dec2", "dec1"]):
        load_convT(t.ups[i], p[name]["up"])
        load_film_double(t.decs[i], p[name]["conv"])
        if t.atts is not None:
            load_cbam(t.atts[i], p[f"att{4 - i}"])
    load_conv(t.out_conv, p["out_conv"])


def test_intrinsics_unet_matches_torch(inputs):
    rgb, _, k4 = inputs
    model = IntrinsicsConditionedUNet(init_features=8, dtype=jnp.float32)
    out, p = jax_apply(model, jnp.asarray(rgb), jnp.asarray(k4))
    t = TIntrinsicsUNet(f=8).train()
    _load_intrinsics(t, p)
    want = to_nhwc(t(nchw(rgb), torch.from_numpy(k4)))
    assert param_count(p) == sum(q.numel() for q in t.parameters())
    np.testing.assert_allclose(out, want, atol=3e-3, rtol=1e-3)


def test_intrinsics_attention_unet_matches_torch(inputs):
    rgb, _, k4 = inputs
    model = IntrinsicsAttentionUNet(init_features=8, dtype=jnp.float32)
    out, p = jax_apply(model, jnp.asarray(rgb), jnp.asarray(k4))
    t = TIntrinsicsUNet(f=8, attention=True).train()
    _load_intrinsics(t, p)
    want = to_nhwc(t(nchw(rgb), torch.from_numpy(k4)))
    assert param_count(p) == sum(q.numel() for q in t.parameters())
    np.testing.assert_allclose(out, want, atol=3e-3, rtol=1e-3)


def _load_geometry(t: TGeometryNet, p, levels: int) -> None:
    load_rayconv(t.enc1, p["enc1"])
    enc_names = [f"enc{i}" for i in range(2, levels + 1)] + ["bottleneck"]
    for i, name in enumerate(enc_names):
        load_geo_encoder(t.encs[i], p[name])
    dec_names = [f"dec{i}" for i in range(levels, 0, -1)]
    for i, name in enumerate(dec_names):
        load_geo_decoder(t.decs[i], p[name])
    load_conv(t.out_conv, p["out_conv"])


def test_geometry_aware_matches_torch(inputs):
    rgb, rays, k4 = inputs
    model = GeometryAwareNetwork(init_features=8, dtype=jnp.float32,
                                 pcl_warp="gather")
    out, p = jax_apply(model, jnp.asarray(rgb), jnp.asarray(rays),
                       jnp.asarray(k4))
    t = TGeometryNet(f=8, levels=5).train()
    _load_geometry(t, p, levels=5)
    want = to_nhwc(t(nchw(rgb), nchw(rays), torch.from_numpy(k4)))
    assert param_count(p) == sum(q.numel() for q in t.parameters())
    np.testing.assert_allclose(out, want, atol=3e-3, rtol=1e-3)


def test_lightweight_geometry_matches_torch(inputs):
    rgb, rays, k4 = inputs
    model = LightweightGeometryNetwork(init_features=8, dtype=jnp.float32,
                                       pcl_warp="gather")
    out, p = jax_apply(model, jnp.asarray(rgb), jnp.asarray(rays),
                       jnp.asarray(k4))
    t = TGeometryNet(f=8, levels=4).train()
    _load_geometry(t, p, levels=4)
    want = to_nhwc(t(nchw(rgb), nchw(rays), torch.from_numpy(k4)))
    assert param_count(p) == sum(q.numel() for q in t.parameters())
    np.testing.assert_allclose(out, want, atol=3e-3, rtol=1e-3)

# ----------------------------------------------------------- gradient parity
#
# Backward-pass certification: the flax grads of each full model (through a
# masked-mean scalar loss) are compared parameter-by-parameter against
# torch autograd on the same oracle with the same ported weights. The flax
# grad TREE is ported into a fresh torch oracle instance using the exact
# same layout converters as the weights (conv kernel transposes, the
# ConvTranspose spatial flip, dense transposes are all linear permutations,
# so gradients transform identically), and compared against `.grad` on the
# oracle that ran `loss.backward()`. This exercises every VJP the training
# step uses: conv / conv-transpose / BN-train-mode backward, the FiLM BN
# branch, CBAM gate products, and PCL's affine-grid + bilinear-resample
# backward (`pcl_layer.h:29-181` semantics via warp_mode="gather").

def _jax_model_grads(model, args, mask):
    variables = model.init(jax.random.PRNGKey(0), *args, train=True)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply({"params": p, **rest}, *args, train=True,
                             mutable=["batch_stats", "intermediates"])
        return jnp.mean(out * mask)

    grads = jax.grad(loss_fn)(params)
    return jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, grads)


def _torch_backward(t, out, mask):
    loss = (out * nchw(mask)).mean()
    loss.backward()


def _assert_grads_match(holder, oracle, tol):
    """holder's parameters hold the flax grads (ported to torch layout);
    oracle's parameters hold torch autograd's .grad.

    film.fc{1,2}.bias feed straight into a train-mode BatchNorm1d, whose
    mean subtraction makes their true gradient EXACTLY zero — both sides
    are asserted ~0 instead of compared relatively (noise/noise ratios are
    meaningless). Everything else is compared by per-tensor relative L2;
    a whole-tree relative L2 bound (10x tighter) catches any systematic
    bias that per-tensor noise tolerances could hide. Tolerances are set
    by the fp32 conditioning of train-mode BN backward (1/std
    amplification), measured at B=8; structural errors are O(1)."""
    hp = dict(holder.named_parameters())
    num = den = 0.0
    for name, p in oracle.named_parameters():
        assert p.grad is not None, name
        g = p.grad.detach().numpy().astype(np.float64)
        gh = hp[name].detach().numpy().astype(np.float64)
        if name.endswith(("film.fc1.bias", "film.fc2.bias")):
            assert np.abs(g).max() < 1e-5, f"{name}: torch grad not ~0"
            assert np.abs(gh).max() < 1e-5, f"{name}: flax grad not ~0"
            continue
        num += float(np.sum((gh - g) ** 2))
        den += float(np.sum(g ** 2))
        scale = max(float(np.linalg.norm(g)), 1e-10)
        err = float(np.linalg.norm(gh - g)) / scale
        assert err < tol, f"{name}: rel-L2 grad err {err:.3e} (tol {tol})"
    assert np.sqrt(num / max(den, 1e-20)) < tol / 10.0


def test_baseline_unet_grads_match_torch(inputs, rng):
    rgb, _, _ = inputs
    mask = rng.uniform(size=(2, 32, 64, 1)).astype(np.float32)
    model = BaselineUNet(init_features=8, dtype=jnp.float32)
    params, grads = _jax_model_grads(model, (jnp.asarray(rgb),),
                                     jnp.asarray(mask))
    t = TBaselineUNet(f=8).train()
    _load_baseline(t, params)
    _torch_backward(t, t(nchw(rgb)), mask)
    holder = TBaselineUNet(f=8)
    _load_baseline(holder, grads)
    _assert_grads_match(holder, t, tol=2e-3)


def _film_inputs(rng, b=8, h=32, w=64):
    """FiLM-bearing models run grad parity at B=8: the FiLM MLP's
    BatchNorm1d normalizes over the BATCH of camera vectors, and at B=2
    its backward is so ill-conditioned (1/std over 2 samples) that fp32
    order-of-operations noise between torch's fused BN backward and
    JAX's composed one reaches ~10% — at B=8 it is ~1e-3 (measured)."""
    rgb = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
    rays = rng.standard_normal((b, h, w, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    k4 = (np.abs(rng.standard_normal((b, 4))) * 30 + 20).astype(np.float32)
    mask = rng.uniform(size=(b, h, w, 1)).astype(np.float32)
    return rgb, rays, k4, mask


def test_intrinsics_unet_grads_match_torch(rng):
    rgb, _, k4, mask = _film_inputs(rng)
    model = IntrinsicsConditionedUNet(init_features=8, dtype=jnp.float32)
    params, grads = _jax_model_grads(
        model, (jnp.asarray(rgb), jnp.asarray(k4)), jnp.asarray(mask))
    t = TIntrinsicsUNet(f=8).train()
    _load_intrinsics(t, params)
    _torch_backward(t, t(nchw(rgb), torch.from_numpy(k4)), mask)
    holder = TIntrinsicsUNet(f=8)
    _load_intrinsics(holder, grads)
    _assert_grads_match(holder, t, tol=2e-2)


def test_geometry_aware_grads_match_torch(rng):
    rgb, rays, k4, mask = _film_inputs(rng)
    model = GeometryAwareNetwork(init_features=8, dtype=jnp.float32,
                                 pcl_warp="gather")
    params, grads = _jax_model_grads(
        model, (jnp.asarray(rgb), jnp.asarray(rays), jnp.asarray(k4)),
        jnp.asarray(mask))
    t = TGeometryNet(f=8, levels=5).train()
    _load_geometry(t, params, levels=5)
    _torch_backward(t, t(nchw(rgb), nchw(rays), torch.from_numpy(k4)), mask)
    holder = TGeometryNet(f=8, levels=5)
    _load_geometry(holder, grads, levels=5)
    _assert_grads_match(holder, t, tol=2e-2)


# ------------------------------------------------------- loss gradient parity

def test_silog_loss_grad_matches_torch(rng):
    """d(SILog)/d(pred) vs torch autograd on a literal re-statement of
    `depth_loss.h:33-64` — certifies the fixed-shape masked `where`
    reductions have the right VJP (incl. the clamp boundaries)."""
    from cadepth_tpu.losses.depth_loss import scale_invariant_loss

    pred = (0.1 + 10.0 * rng.uniform(size=(2, 16, 20, 1))).astype(np.float32)
    gt = (10.0 * rng.uniform(size=(2, 16, 20, 1))).astype(np.float32)
    gt[gt < 2.0] = 0.0  # exercise the validity mask

    g_jax = np.asarray(jax.grad(
        lambda p: scale_invariant_loss(p, jnp.asarray(gt)))(jnp.asarray(pred)))

    tp = torch.tensor(pred, requires_grad=True)
    tg = torch.tensor(gt)
    mask = (tg > 1e-6).float()
    d = (torch.log(torch.clamp(tp, 1e-6, 1000.0)) -
         torch.log(torch.clamp(tg, 1e-6, 1000.0))) * mask
    n = mask.sum()
    loss = (d * d).sum() / n - 0.5 * d.sum() ** 2 / (n * n)
    loss.backward()
    np.testing.assert_allclose(g_jax, tp.grad.numpy(), atol=1e-6, rtol=1e-4)


# ------------------------------------------------------- optimizer parity

@pytest.mark.parametrize("name", ["adam", "adamw", "sgd"])
def test_optimizer_updates_match_torch(name, rng):
    """5 steps of the shipped optimizer factory (`trainer.h:24-92` settings:
    adam/adamw/sgd+nesterov, global-norm clip 0.5) against torch.optim on
    identical gradient sequences — final params equal to ~1e-6."""
    import optax

    from cadepth_tpu.config import OptimizationConfig
    from cadepth_tpu.training.train_state import build_optimizer

    shapes = [(4, 6), (3,), (2, 3, 3, 5)]
    params = {f"p{i}": rng.standard_normal(s).astype(np.float32)
              for i, s in enumerate(shapes)}
    grad_steps = [{k: rng.standard_normal(v.shape).astype(np.float32)
                   for k, v in params.items()} for _ in range(5)]

    opt = OptimizationConfig(optimizer=name, learning_rate=1e-2,
                             weight_decay=1e-2, gradient_clip=True,
                             gradient_clip_value=0.5)
    tx = build_optimizer(opt, optax.constant_schedule(opt.learning_rate))
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    state = tx.init(jp)
    for g in grad_steps:
        updates, state = tx.update(
            {k: jnp.asarray(v) for k, v in g.items()}, state, jp)
        jp = optax.apply_updates(jp, updates)

    tp = {k: torch.tensor(v, requires_grad=True) for k, v in params.items()}
    plist = list(tp.values())
    if name == "adam":
        topt = torch.optim.Adam(plist, lr=1e-2, betas=(0.9, 0.999), eps=1e-8)
    elif name == "adamw":
        topt = torch.optim.AdamW(plist, lr=1e-2, betas=(0.9, 0.999),
                                 eps=1e-8, weight_decay=1e-2)
    else:
        topt = torch.optim.SGD(plist, lr=1e-2, momentum=0.9, nesterov=True)
    for g in grad_steps:
        for k in tp:
            tp[k].grad = torch.tensor(g[k])
        torch.nn.utils.clip_grad_norm_(plist, 0.5)
        topt.step()

    for k in params:
        np.testing.assert_allclose(np.asarray(jp[k]), tp[k].detach().numpy(),
                                   atol=2e-6, rtol=1e-5)
