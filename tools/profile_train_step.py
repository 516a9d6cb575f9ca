"""Component-level timing of the training step on the current backend.

Times each stage of the policy (camera trunk, lift+splat, BEV encoder,
fusion, heads, decoder) and the full fwd/bwd separately, using the
dependency-chain + host-fetch methodology from bench.py (naive timing is
unreliable over remote backends).

    PYTHONPATH="/root/repo:/root/.axon_site" python tools/profile_train_step.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from e2e_parking_carla_tpu.config import Config, ModelConfig, TrainConfig
from e2e_parking_carla_tpu.models import ParkingModel
from e2e_parking_carla_tpu.models.lift_splat import build_splat_plan, lift, splat_static
from e2e_parking_carla_tpu.models.cam_encoder import CamEncoder
from e2e_parking_carla_tpu.models.bev_encoder import BevEncoder
from e2e_parking_carla_tpu.data.rollout import collect_episodes, make_batch
from e2e_parking_carla_tpu.train import trainer as trainer_lib

B = 32


def timed(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    # dependency chain via output-sum feedback is overkill here; a repeated
    # loop with a final host fetch of a full reduction suffices for >10ms ops
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        out = fn(*args)
        acc = jax.tree.leaves(out)[0]
    float(jnp.sum(acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<28} {dt * 1000:8.2f} ms")
    return dt


def main():
    model_cfg = dataclasses.replace(ModelConfig(), backbone="efficientnet-b0")
    cfg = Config(model=model_cfg, train=TrainConfig(batch_size=B))
    model = ParkingModel(model_cfg, cfg.sim)

    buf = jax.jit(lambda k: collect_episodes(k, 32, cfg.model, cfg.sim, cfg.eval))(
        jax.random.PRNGKey(0))
    batch = jax.jit(lambda b, k: make_batch(b, k, B, cfg.model, cfg.sim))(
        buf, jax.random.PRNGKey(1))
    state = trainer_lib.create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    print(f"backend={jax.default_backend()} batch={B} backbone={model_cfg.backbone}")

    # full forward / train step
    fwd = jax.jit(lambda v, b: model.apply(
        v, b["images"], b["ego_motion"], b["target_point"], b["gt_control"],
        train=False)[0])
    timed("forward (teacher-forced)", fwd, variables, batch)

    step = trainer_lib.make_train_step(model, cfg, donate=False)
    timed("train step (fwd+bwd+adam)", lambda s, b: step(s, b, jax.random.PRNGKey(2))[1]["train_loss"],
          state, batch)

    # stages
    cam = CamEncoder(model_cfg, dtype=jnp.bfloat16)
    imgs_flat = batch["images"].reshape(B * 4, model_cfg.image_crop, model_cfg.image_crop, 3)
    cam_vars = jax.jit(lambda: cam.init(jax.random.PRNGKey(0), imgs_flat.astype(jnp.bfloat16)))()
    cam_fn = jax.jit(lambda v, x: cam.apply(v, x.astype(jnp.bfloat16)))
    timed("cam encoder (128 images)", cam_fn, cam_vars, imgs_flat)

    feat, dep = cam_fn(cam_vars, imgs_flat)
    h, w = feat.shape[1], feat.shape[2]
    feat_b = feat.reshape(B, 4, h, w, -1)
    dep_b = dep.reshape(B, 4, h, w, -1)
    plan = build_splat_plan(model_cfg, cfg.sim)

    lift_fn = jax.jit(lambda f, d: lift(f, d, True)[0])
    timed("lift (outer product)", lift_fn, feat_b, dep_b)
    points = lift_fn(feat_b, dep_b)
    splat_fn = jax.jit(lambda p: splat_static(p, plan))
    timed("splat (gather+cumsum)", splat_fn, points)

    from e2e_parking_carla_tpu.models.lift_splat import make_pull_splat

    pull = make_pull_splat(model_cfg, cfg.sim)
    pull_fn = jax.jit(lambda f, d: pull(f, jax.nn.softmax(d, axis=-1)))
    timed("pull splat (fused fwd)", pull_fn, feat_b, dep_b)
    pull_grad = jax.jit(jax.grad(
        lambda f, d: jnp.sum(pull(f, jax.nn.softmax(d, axis=-1)).astype(jnp.float32))))
    timed("pull splat (fwd+bwd)", pull_grad, feat_b, dep_b)

    bev = splat_fn(points).astype(jnp.bfloat16)
    bev65 = jnp.concatenate([bev, jnp.zeros((*bev.shape[:-1], 1), bev.dtype)], -1)
    benc = BevEncoder(resize=model_cfg.bev_encoder_resize, dtype=jnp.bfloat16)
    benc_vars = jax.jit(lambda: benc.init(jax.random.PRNGKey(0), bev65))()
    timed("bev encoder (resnet18)", jax.jit(lambda v, x: benc.apply(v, x)), benc_vars, bev65)

    # batch assembly
    timed("make_batch (sample+render)", jax.jit(
        lambda b, k: make_batch(b, k, B, cfg.model, cfg.sim)["images"]),
        buf, jax.random.PRNGKey(3))


if __name__ == "__main__":
    main()
