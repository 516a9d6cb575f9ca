"""BEV feature encoder: ResNet-18-style trunk over the (64+1)-channel BEV.

Mirrors the reference BevEncoder (model/bev_encoder.py:9-36): bilinear resize
to 256^2, 7x7 stride-2 stem on 65 input channels, maxpool, resnet18 layers
1-3 -> (B, 16, 16, 256), flattened to 256 spatial tokens of 256 channels.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from e2e_parking_carla_tpu.models.layers import (
    BasicBlock,
    ConvBNAct,
    _torch_pad,
    resize_bilinear,
)


class BevEncoder(nn.Module):
    resize: int = 256
    torch_parity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, X, Y, C+1). Returns (B, (resize/16)^2 tokens, 256 ch)."""
        x = resize_bilinear(x, (self.resize, self.resize))
        tp = self.torch_parity
        x = ConvBNAct(64, kernel=7, stride=2,
                      bn_eps=1e-5 if tp else 1e-3,
                      padding=_torch_pad(7) if tp else "SAME",
                      dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=_torch_pad(3) if tp else "SAME")
        for features, stride in ((64, 1), (64, 1), (128, 2), (128, 1),
                                 (256, 2), (256, 1)):
            x = BasicBlock(features, stride=stride, torch_parity=tp,
                           dtype=self.dtype)(x, train)
        # (B, s, s, 256) -> tokens, row-major spatial order (matches the
        # reference's flatten(2) on NCHW: token index = row*s + col)
        b, s = x.shape[0], x.shape[1]
        return x.reshape(b, s * s, 256)
