"""The end-to-end parking policy: assembly of the five submodules.

Mirrors the reference ParkingModel (model/parking_model.py:12-78):
camera encoder -> lift-splat BEV -> target-channel stamp -> BEV encoder ->
feature fusion -> segmentation head, with a teacher-forced `__call__` for
training and a greedy `predict` for closed-loop control.

Inputs are channels-last and batched:
    images       (B, N=4, H, W, 3)   ImageNet-normalized RGB
    ego_motion   (B, 1, 3)           (speed, acc_x, acc_y)
    target_point (B, 3)              target slot in ego frame [x, y, yaw_deg]
    gt_control   (B, 15) int32       BOS + 12 tokens + EOS + PAD
The static-rig splat plan is compiled in; `intrinsics`/`extrinsics` inputs
are accepted for API parity and used by the dynamic-geometry path when they
differ from the rig (reference forward signature, bev_model.py:115-118).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from e2e_parking_carla_tpu.config import ModelConfig, SimConfig
from e2e_parking_carla_tpu.models.bev_encoder import BevEncoder
from e2e_parking_carla_tpu.models.cam_encoder import CamEncoder
from e2e_parking_carla_tpu.models.control_decoder import ControlDecoder, MLPControlDecoder
from e2e_parking_carla_tpu.models.fusion import FeatureFusion
from e2e_parking_carla_tpu.models.lift_splat import (
    build_splat_plan,
    make_pull_splat,
    frustum_geometry,
    lift,
    splat_dynamic,
    splat_static,
)
from e2e_parking_carla_tpu.models.seg_head import SegmentationHead


def add_target_bev(bev_feature, target_point, model_cfg: ModelConfig,
                   noise_rng: Optional[jax.Array] = None):
    """Append a one-hot target channel: an 8x8 block of 1s at the target
    slot's BEV pixel, with +-5 px uniform jitter when `noise_rng` is given
    (training augmentation; reference parking_model.py:28-46).

    Vectorized: the reference's per-sample Python loop becomes a broadcast
    window test. bev_feature (B, X, Y, C); target_point (B, 3) ego-frame.
    """
    B, X, Y, _ = bev_feature.shape
    res_x = model_cfg.bev_x_bound[2]
    res_y = model_cfg.bev_y_bound[2]
    px = (X / 2 + target_point[:, 0] / res_x).astype(jnp.int32)  # (B,)
    py = (Y / 2 + target_point[:, 1] / res_y).astype(jnp.int32)
    if noise_rng is not None:
        noise = jax.random.randint(noise_rng, (B, 2), -int(model_cfg.target_noise_px),
                                   int(model_cfg.target_noise_px) + 1)
        px = px + noise[:, 0]
        py = py + noise[:, 1]
    xs = jnp.arange(X)[None, :, None]  # (1, X, 1)
    ys = jnp.arange(Y)[None, None, :]
    inx = (xs >= px[:, None, None] - 4) & (xs < px[:, None, None] + 4)
    iny = (ys >= py[:, None, None] - 4) & (ys < py[:, None, None] + 4)
    stamp = (inx & iny).astype(bev_feature.dtype)[..., None]  # (B, X, Y, 1)
    return jnp.concatenate([bev_feature, stamp], axis=-1), stamp


class ParkingModel(nn.Module):
    cfg: ModelConfig
    sim_cfg: SimConfig = SimConfig()

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    def setup(self):
        dt = self.dtype
        self.cam_encoder = CamEncoder(self.cfg, dtype=dt)
        self.bev_encoder = BevEncoder(
            resize=self.cfg.bev_encoder_resize,
            torch_parity=getattr(self.cfg, "torch_parity", False), dtype=dt)
        self.feature_fusion = FeatureFusion(self.cfg, dtype=dt)
        if self.cfg.decoder_type == "mlp":
            self.control_decoder = MLPControlDecoder(self.cfg, dtype=dt)
        else:
            self.control_decoder = ControlDecoder(self.cfg, dtype=dt)
        self.segmentation_head = SegmentationHead(self.cfg, dtype=dt)

    def encoder(self, images, ego_motion, target_point, train: bool = False,
                intrinsics=None, extrinsics=None):
        """Shared perception stack. Returns (fused tokens, seg logits,
        depth logits (B,N,h,w,D), target stamp)."""
        cfg = self.cfg
        B, N, H, W, _ = images.shape
        feat, depth_logits = self.cam_encoder(
            images.reshape(B * N, H, W, 3).astype(self.dtype), train)
        h, w = feat.shape[1], feat.shape[2]
        feat = feat.reshape(B, N, h, w, -1)
        if depth_logits is None:
            D = cfg.depth_channels
            depth_logits = jnp.zeros((B, N, h, w, D), feat.dtype)
        else:
            depth_logits = depth_logits.reshape(B, N, h, w, -1)

        if intrinsics is None or extrinsics is None:
            if cfg.splat_mode == "pull":
                # fused path: no (P, C) point tensor is ever formed
                dp = (jax.nn.softmax(depth_logits, axis=-1)
                      if cfg.use_depth_distribution
                      else jnp.ones_like(depth_logits))
                bev = make_pull_splat(cfg, self.sim_cfg)(feat, dp)
            else:
                points, _ = lift(feat, depth_logits, cfg.use_depth_distribution)
                plan = build_splat_plan(cfg, self.sim_cfg)
                bev = splat_static(points, plan)
        else:
            points, _ = lift(feat, depth_logits, cfg.use_depth_distribution)
            geom = frustum_geometry(intrinsics, extrinsics, cfg)
            bev = splat_dynamic(points, geom, cfg)
        bev = bev.astype(self.dtype)

        noise_rng = (self.make_rng("target_noise")
                     if train and self.has_rng("target_noise") else None)
        bev, stamp = add_target_bev(bev, target_point, cfg, noise_rng)

        tokens = self.bev_encoder(bev, train)
        fused = self.feature_fusion(tokens, ego_motion.astype(self.dtype), train)
        seg = self.segmentation_head(fused, train)
        return fused, seg, depth_logits, stamp

    def __call__(self, images, ego_motion, target_point, gt_control,
                 train: bool = False, intrinsics=None, extrinsics=None):
        """Teacher-forced training pass (reference parking_model.py:67-70).

        Returns (control logits (B, 14, V), seg logits, depth logits)."""
        fused, seg, depth, _ = self.encoder(
            images, ego_motion, target_point, train, intrinsics, extrinsics)
        logits = self.control_decoder(fused, gt_control, train)
        return logits, seg, depth

    def predict(self, images, ego_motion, target_point, n_frames: int = 1,
                intrinsics=None, extrinsics=None):
        """Greedy autoregressive decode of `n_frames` control frames
        (3 tokens each; the reference generates 1 frame = 3 tokens,
        parking_model.py:72-78).

        Returns (tokens (B, 1 + 3*n_frames) incl. BOS, seg logits,
        depth logits, target stamp)."""
        fused, seg, depth, stamp = self.encoder(
            images, ego_motion, target_point, False, intrinsics, extrinsics)
        B = images.shape[0]
        prefix = jnp.full((B, 1), self.cfg.bos_token, jnp.int32)
        tokens = self.control_decoder.decode(fused, prefix, 3 * n_frames)
        return tokens, seg, depth, stamp

    def predict_ensemble(self, images, ego_motion, target_point,
                         n_frames: int = 1):
        """Mirror-ensembled greedy decode (test-time augmentation).

        Runs the perception stack on both the observation and its exact
        ego-axis mirror (mirror.py: the rig is LR-symmetric, so the mirrored
        world's render IS the camera-swapped, pixel-flipped original), then
        jointly decodes one token chain from the averaged log-probabilities,
        with the mirrored stream's steer logits permuted back into original
        chirality. By construction the ensembled policy satisfies
        predict(mirror(obs)) == mirror(predict(obs)) — it cannot prefer one
        turning direction over the other. Segmentation logits are averaged
        the same way (the mirrored stream's map un-flipped along BEV +y) so
        target self-tracking is chirality-balanced too. ~2x encoder cost.

        No reference analog (the torch model has no TTA path); added to
        attack the measured chiral failure anatomy of the trained policy.
        """
        from e2e_parking_carla_tpu import mirror as mirror_lib

        m_images, m_ego, m_tp = mirror_lib.mirror_observation(
            images, ego_motion, target_point)
        B = images.shape[0]
        # one encoder call over the stacked (original; mirrored) batch:
        # eval-mode BatchNorm/dropout are per-sample, so this is exact, and
        # the 2B batch keeps the MXU fed instead of paying two dispatches
        fused, seg, depth, stamp = self.encoder(
            jnp.concatenate([images, m_images], axis=0),
            jnp.concatenate([ego_motion, m_ego], axis=0),
            jnp.concatenate([target_point, m_tp], axis=0), False)
        fused_a, fused_b = fused[:B], fused[B:]
        seg_a, seg_b = seg[:B], seg[B:]
        depth, stamp = depth[:B], stamp[:B]
        prefix = jnp.full((B, 1), self.cfg.bos_token, jnp.int32)
        tokens = self.control_decoder.decode_ensemble(
            fused_a, fused_b, prefix, 3 * n_frames)
        # seg logits are (B, X, Y, C) on the BEV grid; BEV +y (rightward)
        # is axis 2 — un-mirror the b-stream and average
        seg = 0.5 * (seg_a + seg_b[:, :, ::-1])
        return tokens, seg, depth, stamp
