"""Imitation losses: control-token CE, weighted BEV seg CE, binned depth BCE.

Behavioral parity with the reference's loss stack (loss/control_loss.py,
loss/seg_loss.py, loss/depth_loss.py; summed in trainer/pl_trainer.py:55-83),
re-expressed as pure functions over channels-last arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from e2e_parking_carla_tpu import tokens as tok
from e2e_parking_carla_tpu.config import ModelConfig


def control_loss(logits, gt_sequence, model_cfg: ModelConfig):
    """CE over the vocab vs the shifted target, ignoring PAD positions
    (reference loss/control_loss.py:8-19)."""
    labels = gt_sequence[:, 1:]  # (B, L)
    logits = logits.astype(jnp.float32)
    valid = labels != model_cfg.pad_token
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.where(valid, labels, 0))
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1)


def segmentation_loss(seg_logits, gt_seg, class_weights, ignore_index: int = 255):
    """Class-weighted CE over the BEV classes (reference loss/seg_loss.py:
    6-26 — note the reference takes the MEAN of per-pixel weighted CE, i.e.
    weights scale each pixel's loss but do not renormalize the denominator).

    seg_logits (B, X, Y, C); gt_seg (B, X, Y) int.
    """
    logits = seg_logits.astype(jnp.float32)
    weights = jnp.asarray(class_weights, jnp.float32)
    valid = gt_seg != ignore_index
    labels = jnp.where(valid, gt_seg, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    ce = ce * weights[labels] * valid
    return jnp.mean(ce)


def downsample_gt_depth(gt_depth, model_cfg: ModelConfig):
    """GT depth (B, N, H, W) meters -> one-hot bins (B, N, h, w, D).

    Min-pool over each down_sample x down_sample patch (zeros treated as
    missing), then bin over d_bound; out-of-range -> all-zero row
    (reference loss/depth_loss.py:32-48).
    """
    k = model_cfg.bev_down_sample
    B, N, H, W = gt_depth.shape
    d = gt_depth.reshape(B, N, H // k, k, W // k, k)
    d = jnp.where(d == 0.0, 1e5, d)
    d = d.min(axis=(3, 5))  # (B, N, h, w)

    lo, _, step = model_cfg.d_bound
    D = model_cfg.depth_channels
    idx = (d - (lo - step)) / step
    in_range = (idx >= 0.0) & (idx < D + 1)
    idx = jnp.where(in_range, idx, 0.0).astype(jnp.int32)
    # one_hot over D+1 then drop bin 0 (the reference's out-of-range dump)
    onehot = jax.nn.one_hot(idx, D + 1, dtype=jnp.float32)[..., 1:]
    return onehot


def depth_loss(depth_logits, gt_depth, model_cfg: ModelConfig):
    """Per-bin binary CE on foreground pixels, fg = any GT bin set
    (reference loss/depth_loss.py:18-30). depth_logits (B, N, h, w, D) raw;
    the reference applies BCE to the softmax over bins."""
    target = downsample_gt_depth(gt_depth, model_cfg)  # (B,N,h,w,D)
    prob = jax.nn.softmax(depth_logits.astype(jnp.float32), axis=-1)
    fg = jnp.max(target, axis=-1) > 0.0  # (B,N,h,w)
    eps = 1e-7
    prob = jnp.clip(prob, eps, 1.0 - eps)
    bce = -(target * jnp.log(prob) + (1.0 - target) * jnp.log(1.0 - prob))
    bce = jnp.sum(bce, axis=-1) * fg
    return jnp.sum(bce) / jnp.maximum(jnp.sum(fg), 1.0)


def control_val_losses(logits, gt_acc, gt_steer, gt_reverse, model_cfg: ModelConfig):
    """Interpretable validation losses (reference loss/control_loss.py:22-75):
    SmoothL1 on detokenized acc + steer, CE on the reverse probability mass
    split at token 101.

    logits: (B, 14, V) teacher-forced outputs; gt_* raw values (B, n_frames).
    """
    # positions 0..11 are the 12 control tokens (drop EOS/PAD tail)
    ctrl = logits[:, :-2, :]
    acc_logits = ctrl[:, 0::3, :]
    steer_logits = ctrl[:, 1::3, :]
    rev_logits = ctrl[:, 2::3, :]

    acc_tok = jnp.argmax(acc_logits, axis=-1)
    pred_acc = tok.detokenize_acc(acc_tok)
    acc_l1 = optax.losses.huber_loss(pred_acc, gt_acc, delta=1.0).mean()

    steer_tok = jnp.argmax(steer_logits, axis=-1)
    pred_steer = steer_tok.astype(jnp.float32) / tok.HALF_TOKEN - 1.0
    steer_l1 = optax.losses.huber_loss(pred_steer, gt_steer, delta=1.0).mean()

    p_fwd, p_rev = tok.reverse_probability(rev_logits)
    rev_log_probs = jnp.log(jnp.stack([p_fwd, p_rev], axis=-1) + 1e-8)
    rev_ce = -jnp.take_along_axis(
        rev_log_probs, gt_reverse[..., None].astype(jnp.int32), axis=-1).mean()

    return acc_l1 + steer_l1, rev_ce


def total_training_loss(control, seg, depth, batch, model_cfg: ModelConfig):
    """Sum of the three losses (reference pl_trainer.py:55-83)."""
    losses = {
        "control_loss": control_loss(control, batch["gt_control"], model_cfg),
        "segmentation_loss": segmentation_loss(
            seg, batch["segmentation"], model_cfg.seg_vehicle_weights),
        "depth_loss": depth_loss(depth, batch["depth"], model_cfg),
    }
    losses["train_loss"] = sum(losses.values())
    return losses
