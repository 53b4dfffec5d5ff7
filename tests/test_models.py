"""Model family tests, mirroring the reference's tests/test_models.cpp:
shape/range tests, conditioning sensitivity, gradient flow — plus
identity-at-init checks that the reference could not express."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cadepth_tpu.models import (
    FiLMLayer,
    CBAM,
    DepthSpatialAttention,
    CameraAwareSpatialAttention,
    PerspectiveCorrectionLayer,
    Perspective3DTransformer,
    BaselineUNet,
    IntrinsicsConditionedUNet,
    IntrinsicsAttentionUNet,
    GeometryAwareNetwork,
    LightweightGeometryNetwork,
    create_model,
    count_parameters,
)
from cadepth_tpu.models.factory import model_inputs
from cadepth_tpu.geometry import ray_grid_batch

B, H, W = 2, 32, 32
MAX_DEPTH = 10.0


def make_inputs(rng, b=B, h=H, w=W):
    rgb = jnp.asarray(rng.uniform(0, 1, size=(b, h, w, 3)).astype(np.float32))
    k = np.tile(np.array([[[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]]],
                         np.float32), (b, 1, 1))
    k4 = jnp.asarray(np.stack([k[:, 0, 0], k[:, 1, 1], k[:, 0, 2], k[:, 1, 2]], -1))
    rays = ray_grid_batch(jnp.asarray(k), h, w)
    return rgb, rays, k4


def init_and_apply(model, rng, *args, **kwargs):
    variables = model.init(jax.random.PRNGKey(0), *args, **kwargs)
    out = model.apply(variables, *args, **kwargs)
    return variables, out


# ---- layers ----

def test_film_shapes_and_modulation(rng):
    feats = jnp.asarray(rng.normal(size=(B, 8, 8, 16)).astype(np.float32))
    cam = jnp.asarray(rng.normal(size=(B, 4)).astype(np.float32))
    film = FiLMLayer(feature_channels=16, dtype=jnp.float32)
    variables, out = init_and_apply(film, rng, feats, cam)
    assert out.shape == feats.shape
    # gamma near 1, beta near 0 at init (identity-init heads with 0.01-std
    # kernels, film_layer.h:67-71): mean modulation stays near identity.
    gamma, beta = film.apply(variables, cam, method=FiLMLayer.get_modulation_params)
    assert gamma.shape == (B, 16) and beta.shape == (B, 16)
    assert abs(float(jnp.mean(gamma)) - 1.0) < 0.5
    assert abs(float(jnp.mean(beta))) < 0.5
    # modulation differs from identity (test_models.cpp FiLM case)
    assert np.abs(np.asarray(out) - np.asarray(feats)).max() > 1e-6


def test_film_different_camera_different_output(rng):
    feats = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    film = FiLMLayer(feature_channels=16, dtype=jnp.float32)
    cam1 = jnp.ones((2, 4))
    cam2 = jnp.ones((2, 4)) * 3.0
    variables = film.init(jax.random.PRNGKey(1), feats, cam1)
    out1 = film.apply(variables, feats, cam1)
    out2 = film.apply(variables, feats, cam2)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-6


def test_cbam_shape(rng):
    x = jnp.asarray(rng.normal(size=(B, 16, 16, 32)).astype(np.float32))
    cbam = CBAM(channels=32, dtype=jnp.float32)
    variables, out = init_and_apply(cbam, rng, x)
    assert out.shape == x.shape
    ch_att, sp_att = cbam.apply(variables, x, method=CBAM.get_attention_maps)
    assert ch_att.shape == (B, 1, 1, 32)
    assert sp_att.shape == (B, 16, 16, 1)
    assert (np.asarray(ch_att) >= 0).all() and (np.asarray(ch_att) <= 1).all()


def test_spatial_attention_lowering_parity(rng):
    """The TPU lowerings of the spatial-attention conv (SpatialGateConv:
    stencil / toeplitz) compute the same convolution as the direct
    lax.conv with the SAME parameter tree — outputs and kernel grads
    agree at f32, at odd non-tile-aligned shapes."""
    from cadepth_tpu.models.attention import SpatialAttention

    x = jnp.asarray(rng.normal(size=(2, 9, 13, 5)).astype(np.float32))
    mods = {low: SpatialAttention(dtype=jnp.float32, lowering=low)
            for low in ("conv", "stencil", "toeplitz")}
    variables = mods["conv"].init(jax.random.PRNGKey(7), x)
    # identical param trees (checkpoints are lowering-interchangeable)
    for low, m in mods.items():
        v = m.init(jax.random.PRNGKey(7), x)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(variables)), low
    ref = np.asarray(mods["conv"].apply(variables, x))

    def kernel_grad(m):
        g = jax.grad(lambda v: (m.apply(v, x) * x.sum(-1, keepdims=True)
                                ).sum())(variables)
        return np.asarray(jax.tree_util.tree_leaves(g)[0])

    gref = kernel_grad(mods["conv"])
    for low in ("stencil", "toeplitz"):
        out = np.asarray(mods[low].apply(variables, x))
        np.testing.assert_allclose(out, ref, atol=1e-5)
        np.testing.assert_allclose(kernel_grad(mods[low]), gref,
                                   rtol=1e-4, atol=1e-5)


def test_depth_spatial_attention_shape(rng):
    x = jnp.asarray(rng.normal(size=(B, 16, 16, 32)).astype(np.float32))
    mod = DepthSpatialAttention(channels=32, dtype=jnp.float32)
    _, out = init_and_apply(mod, rng, x)
    assert out.shape == (B, 16, 16, 1)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_camera_aware_spatial_attention_shape(rng):
    x = jnp.asarray(rng.normal(size=(B, 16, 16, 32)).astype(np.float32))
    cam = jnp.ones((B, 4))
    mod = CameraAwareSpatialAttention(channels=32, dtype=jnp.float32)
    _, out = init_and_apply(mod, rng, x, cam)
    assert out.shape == (B, 16, 16, 1)


def test_pcl_identity_at_init(rng):
    # Identity-init transform head (pcl_layer.h:64-66) + identity affine grid
    # => output equals input at initialization.
    x = jnp.asarray(rng.normal(size=(B, 16, 16, 8)).astype(np.float32))
    k4 = jnp.asarray(rng.uniform(0.5, 1.5, size=(B, 4)).astype(np.float32))
    pcl = PerspectiveCorrectionLayer(feature_channels=8, dtype=jnp.float32)
    _, out = init_and_apply(pcl, rng, x, k4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_pcl_warp_modes_agree(rng):
    """auto / two_pass / gather produce matching outputs with a trained-ish
    (non-identity but rotation-free) head state; auto's guard must pick the
    fast branch at small rotation and the exact branch beyond the bound."""
    x = jnp.asarray(rng.normal(size=(B, 16, 16, 8)).astype(np.float32))
    k4 = jnp.asarray(rng.uniform(0.5, 1.5, size=(B, 4)).astype(np.float32))
    gather = PerspectiveCorrectionLayer(feature_channels=8,
                                        warp_mode="gather", dtype=jnp.float32)
    variables = gather.init(jax.random.PRNGKey(0), x, k4)
    # perturb the head bias into the rotation-free subspace:
    # params = [sx, sy, tx, ty, rot, shear]
    bias = jnp.asarray([1.08, 0.94, 0.12, -0.06, 0.0, 0.15], jnp.float32)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    variables["params"]["fc_transform"]["bias"] = bias
    want = gather.apply(variables, x, k4)
    for mode in ("auto", "two_pass", "pallas", "fused"):
        pcl = PerspectiveCorrectionLayer(feature_channels=8, warp_mode=mode,
                                         dtype=jnp.float32)
        got = pcl.apply(variables, x, k4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3, err_msg=mode)
    # beyond the rotation bound, auto must equal the exact gather path
    bias_rot = bias.at[4].set(0.3)
    variables["params"]["fc_transform"]["bias"] = bias_rot
    want_rot = gather.apply(variables, x, k4)
    auto = PerspectiveCorrectionLayer(feature_channels=8, warp_mode="auto",
                                      dtype=jnp.float32)
    got_rot = auto.apply(variables, x, k4)
    np.testing.assert_allclose(np.asarray(got_rot), np.asarray(want_rot),
                               atol=1e-6)


def test_pcl_ray_gating(rng):
    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    k4 = jnp.ones((1, 4))
    rays = jnp.zeros((1, 8, 8, 3))
    rays = rays.at[..., 2].set(1.0)  # |ray_z| = 1 -> gate = 1.0
    pcl = PerspectiveCorrectionLayer(feature_channels=4, gate_with_rays=True,
                                     dtype=jnp.float32)
    variables = pcl.init(jax.random.PRNGKey(0), x, k4, rays)
    out = pcl.apply(variables, x, k4, rays)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-4)
    rays0 = rays.at[..., 2].set(0.0)  # gate = 0.5
    out0 = pcl.apply(variables, x, k4, rays0)
    np.testing.assert_allclose(np.asarray(out0), 0.5, atol=1e-4)


def test_perspective_3d_transformer_shape(rng):
    x = jnp.asarray(rng.normal(size=(B, 16, 16, 8)).astype(np.float32))
    k4 = jnp.ones((B, 4))
    rays = jnp.asarray(rng.normal(size=(B, 16, 16, 3)).astype(np.float32))
    mod = Perspective3DTransformer(feature_channels=8, dtype=jnp.float32)
    _, out = init_and_apply(mod, rng, x, k4, rays)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


# ---- models ----

def test_baseline_unet_shape_and_range(rng):
    rgb, _, _ = make_inputs(rng)
    model = BaselineUNet(init_features=8, dtype=jnp.float32)
    _, out = init_and_apply(model, rng, rgb)
    assert out.shape == (B, H, W, 1)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= MAX_DEPTH).all()


def test_baseline_unet_param_count_matches_reference():
    # Reference reports ~31M params at init_features=64 (README.md:711).
    model = BaselineUNet(init_features=64, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    n = count_parameters(variables["params"])
    assert 30e6 < n < 32e6, n


@pytest.mark.parametrize("norm,upsample", [("group", "transpose"),
                                           ("batch", "resize"),
                                           ("group", "resize")])
def test_baseline_unet_experiment_knobs(rng, norm, upsample):
    """norm=group / decoder_upsample=resize opt-ins (VERDICT r2 item 4):
    valid outputs, gradients flow, and group-norm leaves no batch
    statistics behind."""
    rgb, _, _ = make_inputs(rng)
    # group cases use f=12 so a non-multiple-of-32 width (48 channels at
    # the f*4 level) exercises the divisor-based num_groups choice
    feats = 12 if norm == "group" else 8
    model = BaselineUNet(init_features=feats, dtype=jnp.float32, norm=norm,
                         decoder_upsample=upsample)
    variables = model.init(jax.random.PRNGKey(0), rgb)
    out = model.apply(variables, rgb)
    o = np.asarray(out)
    assert out.shape == (B, H, W, 1)
    assert np.isfinite(o).all() and (o >= 0).all() and (o <= MAX_DEPTH).all()
    if norm == "group":
        assert "batch_stats" not in variables

    def loss(params):
        return jnp.sum(model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}}, rgb, train=True,
            mutable=["batch_stats"])[0] ** 2)

    grads = jax.grad(loss)(variables["params"])
    gmax = max(float(jnp.abs(g).max())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_geometry_experiment_knobs_train_step(rng):
    """The flagship accepts the experiment knobs end to end (factory +
    train step + no-batch-stats state plumbing for norm=group)."""
    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.training.train_state import (
        build_model_and_loss,
        build_optimizer,
        create_train_state,
        make_train_step,
    )
    from cadepth_tpu.training.schedule import build_lr_schedule

    rgb, rays, k4 = make_inputs(rng)
    k = np.tile(np.array([[[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]]],
                         np.float32), (B, 1, 1))
    batch = {"rgb": rgb, "depth": jnp.ones((B, H, W, 1)) * 2.0,
             "intrinsics": jnp.asarray(k), "k4": k4}
    cfg = config_from_dict({
        "model": {"architecture": "geometry_aware_lightweight",
                  "init_features": 4, "norm": "group",
                  "decoder_upsample": "resize"},
        "training": {"batch_size": B, "use_amp": False},
        "optimization": {"lr_scheduler": "none", "lr_warmup_epochs": 0},
    })
    model, loss_fn = build_model_and_loss(cfg)
    tx = build_optimizer(cfg.optimization,
                         build_lr_schedule(cfg.optimization, 10, 10))
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(cfg, model, loss_fn, tx, donate=False)
    state2, logs = step(state, batch)
    assert np.isfinite(float(logs["total_loss"]))
    assert int(state2.step) == 1


def test_config_rejects_bad_experiment_knobs():
    from cadepth_tpu.config import config_from_dict

    with pytest.raises(ValueError, match="norm"):
        config_from_dict({"model": {"norm": "layer"}})
    with pytest.raises(ValueError, match="decoder_upsample"):
        config_from_dict({"model": {"decoder_upsample": "pixelshuffle"}})


def test_intrinsics_unet_conditioning_sensitivity(rng):
    # Different K must produce different depth (test_models.cpp:248-288).
    rgb, _, k4 = make_inputs(rng)
    model = IntrinsicsConditionedUNet(init_features=8, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), rgb, k4)
    out1 = model.apply(variables, rgb, k4)
    out2 = model.apply(variables, rgb, k4 * 2.0)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-7
    assert out1.shape == (B, H, W, 1)


def test_intrinsics_attention_unet_shape(rng):
    rgb, _, k4 = make_inputs(rng)
    model = IntrinsicsAttentionUNet(init_features=8, dtype=jnp.float32)
    _, out = init_and_apply(model, rng, rgb, k4)
    assert out.shape == (B, H, W, 1)


def test_geometry_aware_network_shape(rng):
    rgb, rays, k4 = make_inputs(rng)
    model = GeometryAwareNetwork(init_features=4, dtype=jnp.float32)
    _, out = init_and_apply(model, rng, rgb, rays, k4)
    assert out.shape == (B, H, W, 1)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= MAX_DEPTH).all()


def test_lightweight_geometry_network_shape(rng):
    rgb, rays, k4 = make_inputs(rng)
    model = LightweightGeometryNetwork(init_features=4, dtype=jnp.float32)
    _, out = init_and_apply(model, rng, rgb, rays, k4)
    assert out.shape == (B, H, W, 1)


def test_gradient_flow_geometry_aware(rng):
    # Full fwd+bwd; some parameter gradient must be nonzero
    # (test_models.cpp:514-558).
    rgb, rays, k4 = make_inputs(rng, b=1)
    model = GeometryAwareNetwork(init_features=4, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), rgb, rays, k4, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, rgb, rays, k4,
            train=True, mutable=["batch_stats"])
        return jnp.mean((out - 5.0) ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


def test_factory_all_architectures(rng):
    rgb, rays, k4 = make_inputs(rng, b=1)
    batch = {"rgb": rgb, "rays": rays, "k4": k4}
    for arch in ("baseline_unet", "intrinsics_unet", "intrinsics_attention_unet",
                 "geometry_aware", "geometry_aware_lightweight"):
        model = create_model(arch, init_features=4, dtype=jnp.float32)
        args, kwargs = model_inputs(arch, batch)
        variables = model.init(jax.random.PRNGKey(0), *args, **kwargs)
        out = model.apply(variables, *args, **kwargs)
        assert out.shape == (1, H, W, 1), arch


def test_factory_unknown_raises():
    with pytest.raises(ValueError):
        create_model("not_a_model")


def test_sa_lowering_plumbs_to_models(rng):
    """config -> factory -> module attribute, and model-level f32 parity
    between the toeplitz default and the reference-style conv lowering
    (same params, geometry model end to end)."""
    from cadepth_tpu.config import config_from_dict
    from cadepth_tpu.training.train_state import build_model_and_loss

    cfg = config_from_dict({"model": {"architecture": "geometry_aware",
                                      "init_features": 4,
                                      "sa_lowering": "conv"},
                            "training": {"use_amp": False}})
    model_conv, _ = build_model_and_loss(cfg)
    assert model_conv.sa_lowering == "conv"
    cfg2 = config_from_dict({"model": {"architecture": "geometry_aware",
                                       "init_features": 4},
                             "training": {"use_amp": False}})
    model_toep, _ = build_model_and_loss(cfg2)
    assert model_toep.sa_lowering == "toeplitz"

    rgb, rays, k4 = make_inputs(rng, b=1)
    variables = model_conv.init(jax.random.PRNGKey(0), rgb, rays, k4)
    # identical param trees -> apply the same variables through both
    out_conv = np.asarray(model_conv.apply(variables, rgb, rays, k4))
    out_toep = np.asarray(model_toep.apply(variables, rgb, rays, k4))
    np.testing.assert_allclose(out_toep, out_conv, rtol=1e-4, atol=1e-4)


def test_models_jit_with_bf16(rng):
    rgb, rays, k4 = make_inputs(rng, b=1)
    model = GeometryAwareNetwork(init_features=4, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), rgb, rays, k4)

    @jax.jit
    def fwd(v, r, ry, k):
        return model.apply(v, r, ry, k)

    out = fwd(variables, rgb, rays, k4)
    assert out.dtype == jnp.float32  # output head is fp32
    assert np.isfinite(np.asarray(out)).all()


def test_remat_identical_outputs(rng):
    """Gradient checkpointing must not change numerics."""
    rgb, rays, k4 = make_inputs(rng, b=1)
    m0 = GeometryAwareNetwork(init_features=4, remat=False, dtype=jnp.float32)
    m1 = GeometryAwareNetwork(init_features=4, remat=True, dtype=jnp.float32)
    variables = m0.init(jax.random.PRNGKey(0), rgb, rays, k4)
    o0 = m0.apply(variables, rgb, rays, k4)
    o1 = m1.apply(variables, rgb, rays, k4)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_factory_intrinsics_attention_dispatch():
    """Parity with createModel (train_main.cpp:186-213): intrinsics_unet +
    use_attention selects the CBAM variant."""
    m1 = create_model("intrinsics_unet", init_features=4, use_attention=False,
                      dtype=jnp.float32)
    m2 = create_model("intrinsics_unet", init_features=4, use_attention=True,
                      dtype=jnp.float32)
    assert isinstance(m1, IntrinsicsConditionedUNet)
    assert isinstance(m2, IntrinsicsAttentionUNet)


def test_estimate_memory_real_shapes(rng):
    """estimate_memory_mb is computed from the actual NHWC pyramid and
    should land within a small factor of XLA's own accounting."""
    from cadepth_tpu.models import estimate_memory_mb
    from cadepth_tpu.models.factory import compiled_memory_analysis

    model = BaselineUNet(init_features=8, dtype=jnp.float32)
    rgb = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), rgb)
    est = estimate_memory_mb(variables["params"], 2, 64, 64,
                             init_features=8, levels=4)
    real = compiled_memory_analysis(model, {"rgb": rgb}, "baseline_unet")
    assert est > 0
    if real:  # backend may not expose memory_analysis
        # fused inference uses less than the conservative training estimate,
        # but the two must agree within an order of magnitude
        assert real["total_mb"] / 8 < est < real["total_mb"] * 20


def test_remat_modes_identical_outputs(rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    outs = []
    for rm in (False, True, "highres"):
        m = BaselineUNet(init_features=4, remat=rm, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        outs.append(np.asarray(m.apply(v, x)))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
