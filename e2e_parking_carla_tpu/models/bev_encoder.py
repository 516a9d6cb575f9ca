"""BEV feature encoder: ResNet-18-style trunk over the (64+1)-channel BEV.

Mirrors the reference BevEncoder (model/bev_encoder.py:9-36): bilinear resize
to 256^2, 7x7 stride-2 stem on 65 input channels, maxpool, resnet18 layers
1-3 -> (B, 16, 16, 256), flattened to 256 spatial tokens of 256 channels.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from e2e_parking_carla_tpu.models.layers import BasicBlock, ConvBNAct, resize_bilinear


class BevEncoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, X, Y, C+1). Returns (B, 256 tokens, 256 channels)."""
        x = resize_bilinear(x, (256, 256))
        x = ConvBNAct(64, kernel=7, stride=2, dtype=self.dtype)(x, train)  # 128
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # 64
        for features, stride in ((64, 1), (64, 1), (128, 2), (128, 1),
                                 (256, 2), (256, 1)):
            x = BasicBlock(features, stride=stride, dtype=self.dtype)(x, train)
        # (B, 16, 16, 256) -> tokens, row-major spatial order (matches the
        # reference's flatten(2) on NCHW: token index = row*16 + col)
        b = x.shape[0]
        return x.reshape(b, 16 * 16, 256)
