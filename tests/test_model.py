"""Model tests: splat correctness vs a dense reference, shapes of every
submodule, teacher-forced + greedy paths, and loss functions."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2e_parking_carla_tpu.config import ModelConfig, SimConfig
from e2e_parking_carla_tpu import geometry as geo
from e2e_parking_carla_tpu import losses, tokens
from e2e_parking_carla_tpu.models.lift_splat import (
    SplatPlan,
    build_splat_plan,
    frustum_geometry,
    lift,
    splat_dynamic,
    splat_static,
)
from e2e_parking_carla_tpu.models.parking_model import ParkingModel, add_target_bev

SIM = SimConfig()

# Small-but-structurally-complete config for CPU tests: b0 backbone, 64px
# images, coarse BEV/depth grids, slim transformer FFNs.
TINY = dataclasses.replace(
    ModelConfig(),
    backbone="efficientnet-b0",
    image_crop=64,
    final_dim=(64, 64),
    bev_x_bound=(-10.0, 10.0, 0.4),
    bev_y_bound=(-10.0, 10.0, 0.4),
    d_bound=(0.5, 12.5, 1.0),
    bev_encoder_resize=64,
    tf_en_layers=1,
    tf_de_layers=1,
    tf_en_ffn_dim=64,
    tf_de_ffn_dim=64,
    compute_dtype="float32",
)


def tiny_batch(B=2, key=jax.random.PRNGKey(0)):
    ks = jax.random.split(key, 4)
    H = TINY.image_crop
    images = jax.random.normal(ks[0], (B, 4, H, H, 3), jnp.float32)
    ego_motion = jax.random.normal(ks[1], (B, 1, 3), jnp.float32)
    target_point = jnp.tile(jnp.array([[5.0, -2.0, 90.0]], jnp.float32), (B, 1))
    frames = jax.random.randint(ks[2], (B, 4, 3), 0, 200)
    gt_control = tokens.build_sequence(frames, TINY.tf_de_tgt_dim)
    seg = jax.random.randint(ks[3], (B, *TINY.bev_size), 0, 3)
    depth = jnp.abs(jax.random.normal(ks[3], (B, 4, H, H))) * 5.0
    return dict(images=images, ego_motion=ego_motion, target_point=target_point,
                gt_control=gt_control, segmentation=seg, depth=depth)


# ---------------------------------------------------------------------------
# lift-splat
# ---------------------------------------------------------------------------


def test_splat_static_matches_dense_reference():
    """The gather/cumsum/gather splat must equal a brute-force numpy
    accumulation over the same voxelization."""
    plan = build_splat_plan(TINY, SIM)
    P, (X, Y) = plan.n_points, plan.grid
    rng = np.random.RandomState(0)
    C = 5
    pts = rng.randn(2, P, C).astype(np.float32)
    out = np.asarray(splat_static(jnp.asarray(pts), plan))

    # dense reference from the plan's own sorted runs
    dense = np.zeros((2, X * Y, C), np.float32)
    sorted_pts = pts[:, plan.perm]
    for vox in range(X * Y):
        s, e = plan.starts[vox], plan.ends[vox]
        if e > s:
            dense[:, vox] = sorted_pts[:, s:e].sum(axis=1)
    np.testing.assert_allclose(out, dense.reshape(2, X, Y, C), rtol=1e-3, atol=1e-3)


def test_splat_static_matches_dynamic():
    """Static plan vs runtime segment-sum with the same rig geometry."""
    plan = build_splat_plan(TINY, SIM)
    P = plan.n_points
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(1, P, 4).astype(np.float32))

    intr, extr = geo.build_rig(TINY.image_crop, width=SIM.cam_fov_full_width,
                               height=300, fov_deg=SIM.cam_fov_deg)
    intr_b = jnp.asarray(intr)[None]
    extr_b = jnp.asarray(extr)[None]
    geom = frustum_geometry(intr_b, extr_b, TINY)
    dyn = np.asarray(splat_dynamic(pts, geom, TINY))
    stat = np.asarray(splat_static(pts, plan))
    np.testing.assert_allclose(stat, dyn, rtol=1e-3, atol=1e-3)


def test_splat_differentiable():
    plan = build_splat_plan(TINY, SIM)
    pts = jnp.ones((1, plan.n_points, 2))

    def f(p):
        return jnp.sum(splat_static(p, plan) ** 2)

    g = jax.grad(f)(pts)
    assert g.shape == pts.shape
    assert bool(jnp.isfinite(g).all())


def test_pull_splat_matches_static():
    """The fused pull-mode splat must agree with the lift + sorted-cumsum
    path on random features/depth (same math, different summation order)."""
    from e2e_parking_carla_tpu.models.lift_splat import make_pull_splat

    plan = build_splat_plan(TINY, SIM)
    h = TINY.final_dim[0] // TINY.bev_down_sample
    D = TINY.depth_channels
    C = 5
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    feat = jax.random.normal(k1, (2, 4, h, h, C), jnp.float32)
    logits = jax.random.normal(k2, (2, 4, h, h, D), jnp.float32)

    pts, _ = lift(feat, logits, use_depth_distribution=True)
    ref = np.asarray(splat_static(pts, plan))

    dp = jax.nn.softmax(logits, axis=-1)
    out = np.asarray(make_pull_splat(TINY, SIM)(feat, dp))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_pull_splat_vjp_matches_static():
    """The custom (gather-only) VJP must match the autodiff gradient of the
    cumsum path for both feat and depth-prob inputs."""
    from e2e_parking_carla_tpu.models.lift_splat import make_pull_splat

    plan = build_splat_plan(TINY, SIM)
    h = TINY.final_dim[0] // TINY.bev_down_sample
    D = TINY.depth_channels
    C = 3
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    feat = jax.random.normal(k1, (1, 4, h, h, C), jnp.float32)
    dp = jax.nn.softmax(jax.random.normal(k2, (1, 4, h, h, D)), axis=-1)
    X, Y = plan.grid
    cotangent = jax.random.normal(k3, (1, X, Y, C), jnp.float32)

    def ref_fn(f, p):
        # lift() without the softmax: outer product + reorder to plan order
        B, N, hh, ww, CC = f.shape
        x = p[..., None] * f[..., None, :]
        x = jnp.transpose(x, (0, 1, 4, 2, 3, 5)).reshape(B, -1, CC)
        return jnp.sum(splat_static(x, plan) * cotangent)

    pull = make_pull_splat(TINY, SIM)
    g_ref = jax.grad(ref_fn, argnums=(0, 1))(feat, dp)
    g_pull = jax.grad(lambda f, p: jnp.sum(pull(f, p) * cotangent),
                      argnums=(0, 1))(feat, dp)
    np.testing.assert_allclose(np.asarray(g_pull[0]), np.asarray(g_ref[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pull[1]), np.asarray(g_ref[1]),
                               rtol=1e-4, atol=1e-5)


def test_lift_point_ordering():
    """lift() must order points (N, D, h, w) to match the frustum plan."""
    B, N, h, w, C, D = 1, 2, 3, 3, 2, 4
    feat = jnp.arange(B * N * h * w * C, dtype=jnp.float32).reshape(B, N, h, w, C)
    depth_logits = jnp.zeros((B, N, h, w, D))
    pts, prob = lift(feat, depth_logits, use_depth_distribution=False)
    assert pts.shape == (B, N * D * h * w, C)
    # point index for (n=1, d=0, y=0, x=0) = 1*D*h*w = 36 -> feat[0,1,0,0]
    np.testing.assert_allclose(pts[0, D * h * w], feat[0, 1, 0, 0])
    # uniform softmax over D
    np.testing.assert_allclose(np.asarray(prob), 1.0 / D, atol=1e-6)


def test_add_target_bev_stamp():
    cfg = TINY  # 50x50 grid at 0.4 m
    bev = jnp.zeros((1, 50, 50, 3))
    tp = jnp.array([[4.0, -2.0, 0.0]], jnp.float32)  # -> px 25+10=35, py 25-5=20
    out, stamp = add_target_bev(bev, tp, cfg)
    assert out.shape == (1, 50, 50, 4)
    rows, cols = np.where(np.asarray(stamp[0, :, :, 0]) > 0)
    assert rows.min() == 35 - 4 and rows.max() == 35 + 3
    assert cols.min() == 20 - 4 and cols.max() == 20 + 3
    assert len(rows) == 64


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def model_and_params():
    model = ParkingModel(TINY, SIM)
    batch = tiny_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["images"], batch["ego_motion"], batch["target_point"],
        batch["gt_control"], train=False,
    )
    return model, variables


def test_forward_shapes(model_and_params):
    model, variables = model_and_params
    batch = tiny_batch()
    logits, seg, depth = model.apply(
        variables, batch["images"], batch["ego_motion"], batch["target_point"],
        batch["gt_control"], train=False)
    B = batch["images"].shape[0]
    assert logits.shape == (B, TINY.tf_de_tgt_dim - 1, TINY.token_nums)
    assert seg.shape == (B, *TINY.bev_size, TINY.seg_classes)
    h = TINY.image_crop // TINY.bev_down_sample
    assert depth.shape == (B, 4, h, h, TINY.depth_channels)


def test_predict_tokens_valid(model_and_params):
    model, variables = model_and_params
    batch = tiny_batch()
    toks, seg, depth, stamp = model.apply(
        variables, batch["images"], batch["ego_motion"], batch["target_point"],
        method=model.predict)
    B = batch["images"].shape[0]
    assert toks.shape == (B, 4)  # BOS + 3 generated
    assert int(toks[0, 0]) == TINY.bos_token
    assert np.asarray(toks).max() < TINY.token_nums
    assert stamp.shape[:-1] == (B, *TINY.bev_size)


def test_train_step_decreases_loss(model_and_params):
    """Single-batch overfit smoke: a few Adam steps reduce the total loss."""
    import optax

    model, variables = model_and_params
    batch = tiny_batch()
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, bstats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": bstats},
                batch["images"], batch["ego_motion"], batch["target_point"],
                batch["gt_control"], train=True,
                rngs={"dropout": jax.random.PRNGKey(2),
                      "target_noise": jax.random.PRNGKey(3)},
                mutable=["batch_stats"])
            logits, seg, depth = out
            ld = losses.total_training_loss(logits, seg, depth, batch, TINY)
            return ld["train_loss"], (ld, updates["batch_stats"])

        (loss, (ld, new_bstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, upd)
        return params, new_bstats, opt_state, loss

    params, bstats, opt_state, l0 = step(params, bstats, opt_state)
    for _ in range(4):
        params, bstats, opt_state, l = step(params, bstats, opt_state)
    assert np.isfinite(float(l0)) and np.isfinite(float(l))
    assert float(l) < float(l0)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def test_control_loss_ignores_pad():
    B, L, V = 2, 14, 204
    logits = jnp.zeros((B, L, V))
    frames = jnp.zeros((B, 4, 3), jnp.int32)
    seq = tokens.build_sequence(frames, 15)
    l_uniform = losses.control_loss(logits, seq, TINY)
    # uniform logits -> CE = log(V) on every non-pad position
    np.testing.assert_allclose(float(l_uniform), np.log(V), rtol=1e-5)

    # perfect logits on non-pad positions, garbage on PAD position
    perfect = jax.nn.one_hot(seq[:, 1:], V) * 100.0
    perfect = perfect.at[:, -1, :].set(jnp.roll(perfect[:, -1, :], 1, axis=-1))
    assert float(losses.control_loss(perfect, seq, TINY)) < 1e-3


def test_segmentation_loss_weights():
    B, X, Y, C = 1, 4, 4, 3
    logits = jnp.zeros((B, X, Y, C))
    gt0 = jnp.zeros((B, X, Y), jnp.int32)
    gt2 = jnp.full((B, X, Y), 2, jnp.int32)
    l0 = float(losses.segmentation_loss(logits, gt0, (1.0, 2.0, 2.0)))
    l2 = float(losses.segmentation_loss(logits, gt2, (1.0, 2.0, 2.0)))
    np.testing.assert_allclose(l2, 2 * l0, rtol=1e-5)


def test_depth_binning():
    cfg = TINY  # d_bound (0.5, 12.5, 1.0) -> 12 bins
    gt = jnp.full((1, 1, 8, 8), 3.2)
    onehot = np.asarray(losses.downsample_gt_depth(gt, cfg))
    assert onehot.shape == (1, 1, 1, 1, 12)
    # idx = (3.2 - (0.5-1.0))/1.0 = 3.7 -> bin 3 -> after dropping bin0: ch 2
    assert onehot[0, 0, 0, 0].argmax() == 2
    # out of range -> all zeros
    far = jnp.full((1, 1, 8, 8), 99.0)
    assert np.asarray(losses.downsample_gt_depth(far, cfg)).sum() == 0
    # min-pool: one near pixel dominates the patch
    mixed = jnp.full((1, 1, 8, 8), 9.0).at[0, 0, 3, 3].set(1.0)
    oh = np.asarray(losses.downsample_gt_depth(mixed, cfg))
    assert oh[0, 0, 0, 0].argmax() == 0  # idx=(1.0+0.5)/1=1.5 -> bin1 -> ch0

def test_control_val_losses_perfect_prediction():
    B, F = 2, 4
    gt_acc = jnp.array([[0.5, -0.3, 0.0, 0.2]] * B)
    gt_steer = jnp.array([[0.1, -0.9, 0.5, 0.0]] * B)
    gt_rev = jnp.array([[0, 1, 1, 0]] * B, jnp.int32)
    frames = tokens.tokenize(jnp.maximum(gt_acc, 0), jnp.maximum(-gt_acc, 0),
                             gt_steer, gt_rev)
    logits = jax.nn.one_hot(frames.reshape(B, 12), 204) * 50.0
    full = jnp.concatenate([logits, jnp.zeros((B, 2, 204))], axis=1)
    acc_steer, rev = losses.control_val_losses(full, gt_acc, gt_steer, gt_rev, TINY)
    assert float(acc_steer) < 1e-3  # quantization-level error
    assert float(rev) < 1e-3


def test_forward_with_runtime_geometry(model_and_params):
    """API parity: passing intrinsics/extrinsics routes through the dynamic
    segment-sum splat and must agree with the static-plan path when the
    geometry equals the built-in rig (reference forward signature,
    bev_model.py:115-118)."""
    model, variables = model_and_params
    batch = tiny_batch()
    intr, extr = geo.build_rig(TINY.image_crop, width=SIM.cam_fov_full_width,
                               height=300, fov_deg=SIM.cam_fov_deg)
    B = batch["images"].shape[0]
    intr_b = jnp.tile(jnp.asarray(intr)[None], (B, 1, 1, 1))
    extr_b = jnp.tile(jnp.asarray(extr)[None], (B, 1, 1, 1))

    static_out = model.apply(
        variables, batch["images"], batch["ego_motion"], batch["target_point"],
        batch["gt_control"], train=False)
    dyn_out = model.apply(
        variables, batch["images"], batch["ego_motion"], batch["target_point"],
        batch["gt_control"], train=False, intrinsics=intr_b, extrinsics=extr_b)
    np.testing.assert_allclose(np.asarray(static_out[0]), np.asarray(dyn_out[0]),
                               rtol=2e-2, atol=2e-2)
