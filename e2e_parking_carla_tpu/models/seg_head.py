"""BEV segmentation head over the fused tokens.

Mirrors the reference SegmentationHead (model/segmentation_head.py:10-47):
tokens reshaped back to a 16x16 map, FPN-style 1x1 convs with 2x bilinear
upsampling three times, final interpolation to 200x200, and a conv head to
the 3 classes.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from e2e_parking_carla_tpu.config import ModelConfig
from e2e_parking_carla_tpu.models.layers import resize_bilinear


class SegmentationHead(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fused, train: bool = False):
        """fused: (B, L, tf_en_dim). Returns logits (B, X, Y, seg_classes)."""
        cfg = self.cfg
        b, length, c = fused.shape
        side = int(length ** 0.5)
        x = fused.reshape(b, side, side, c)
        mid = cfg.bev_encoder_in_channel

        x = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype)(x))
        for _ in range(3):
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
            x = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype)(x))
        x = resize_bilinear(x, cfg.bev_size)
        x = nn.Conv(mid, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = nn.relu(x)
        return nn.Conv(cfg.seg_classes, (1, 1), dtype=self.dtype)(x)
