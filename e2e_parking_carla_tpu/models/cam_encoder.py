"""Per-camera encoder: EfficientNet trunk + DeepLab feature/depth heads.

Mirrors the reference CamEncoder (model/cam_encoder.py:9-100): the stride-16
endpoint runs through a DeepLabHead then an UpsamplingConcat with the
stride-8 skip, producing C=64 feature channels and D=48 depth-bin logits at
1/8 resolution (32x32 for the 256 crop).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from e2e_parking_carla_tpu.config import ModelConfig
from e2e_parking_carla_tpu.models.efficientnet import EfficientNetTrunk
from e2e_parking_carla_tpu.models.layers import DeepLabHead, UpsamplingConcat


class CamEncoder(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (B*, H, W, 3) normalized RGB. Returns (feat (B*,h,w,C),
        depth_logits (B*,h,w,D))."""
        version = self.cfg.backbone.split("-")[1]
        tp = getattr(self.cfg, "torch_parity", False)
        s8, s16 = EfficientNetTrunk(version=version, dtype=self.dtype)(images, train)

        c16 = s16.shape[-1]
        feat = DeepLabHead(c16, hidden=64, torch_parity=tp, dtype=self.dtype,
                           name="feature_head")(s16, train)
        feat = UpsamplingConcat(self.cfg.bev_encoder_in_channel, torch_parity=tp,
                                dtype=self.dtype, name="feature_up")(feat, s8, train)

        if self.cfg.use_depth_distribution:
            depth = DeepLabHead(c16, hidden=64, torch_parity=tp, dtype=self.dtype,
                                name="depth_head")(s16, train)
            depth = UpsamplingConcat(self.cfg.depth_channels, torch_parity=tp,
                                     dtype=self.dtype, name="depth_up")(depth, s8, train)
        else:
            depth = None
        return feat, depth
