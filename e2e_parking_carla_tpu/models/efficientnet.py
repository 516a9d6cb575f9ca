"""EfficientNet-compatible camera backbone (flax.linen, NHWC).

Re-implementation of the trunk the reference takes from efficientnet_pytorch
(model/cam_encoder.py:17,61-100): MBConv stages run only up to stride 16
(blocks past index 21 for b4 / 10 for b0 are deleted, cam_encoder.py:42-58),
and the two endpoints that feed the heads are the stride-8 and stride-16
feature maps. Channel counts match the reference's expectations
(cam_encoder.py:19-22: b4 -> 56/160, b0 -> 40/112).

No pretrained torch weights exist on the TPU path (SURVEY §7 hard parts);
the policy trains from scratch against on-device rollouts.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from e2e_parking_carla_tpu.models.layers import ConvBNAct, MBConv

# base (b0) stage layout: (expand, channels, repeats, stride, kernel)
_B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
)  # stages past stride 16 are never used (deleted in the reference)

_MULTIPLIERS = {
    "b0": (1.0, 1.0),
    "b4": (1.4, 1.8),
}


def _round_filters(filters: int, width: float) -> int:
    divisor = 8
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def _round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def backbone_channels(version: str) -> Tuple[int, int]:
    """(stride-8 channels, stride-16 channels) for a version."""
    width, _ = _MULTIPLIERS[version]
    return _round_filters(40, width), _round_filters(112, width)


class EfficientNetTrunk(nn.Module):
    """Returns (stride-8 features, stride-16 features)."""

    version: str = "b4"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, depth = _MULTIPLIERS[self.version]
        x = ConvBNAct(_round_filters(32, width), kernel=3, stride=2,
                      act=nn.swish, dtype=self.dtype)(x, train)
        cur_stride = 2
        feat_s8 = None
        for expand, ch, repeats, stride, kernel in _B0_STAGES:
            ch = _round_filters(ch, width)
            for i in range(_round_repeats(repeats, depth)):
                s = stride if i == 0 else 1
                if s == 2 and cur_stride == 8:
                    feat_s8 = x  # the reference's reduction_3 endpoint
                x = MBConv(ch, kernel=kernel, stride=s, expand=expand,
                           dtype=self.dtype)(x, train)
                cur_stride *= s
        return feat_s8, x
