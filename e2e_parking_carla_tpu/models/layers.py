"""Reusable conv/attention building blocks (flax.linen, NHWC).

TPU-native re-design of the reference's conv library (model/convolutions.py):
only the pieces the policy actually uses are kept (the reference ships 382
lines of which only UpsamplingConcat + DeepLabHead are live, convolutions.py:
183-201, 274-282), plus torch-compatible post-LN transformer layers matching
nn.TransformerEncoderLayer/DecoderLayer defaults (relu, d_ff=2048,
norm_first=False) used by model/feature_fusion.py:13-17 and
model/control_predict.py:18-19.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def resize_bilinear(x, size):
    """NHWC bilinear resize (align_corners=False, half-pixel centers) —
    equivalent to F.interpolate(..., mode='bilinear', align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> activation.

    `padding` defaults to TF-style SAME (what efficientnet_pytorch's
    Conv2dStaticSamePadding computes). torch's plain Conv2d(padding=k//2)
    differs from SAME at stride 2 on even inputs — pass explicit symmetric
    padding (and bn_eps=1e-5, the torch BatchNorm2d default) to reproduce
    torchvision-style modules exactly (see ModelConfig.torch_parity)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: Optional[Callable] = nn.relu
    bn_eps: float = 1e-3
    padding: Any = "SAME"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.padding,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=self.bn_eps, dtype=jnp.float32)(x)
        if self.act is not None:
            x = self.act(x)
        return x


def _torch_pad(kernel: int):
    """torch Conv2d(padding=kernel//2) as an explicit flax padding tuple."""
    p = kernel // 2
    return ((p, p), (p, p))


class SqueezeExcite(nn.Module):
    """SE block (EfficientNet-style, reduce over the block input width)."""

    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype)(s)
        s = nn.swish(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with SE (EfficientNet block)."""

    features: int
    kernel: int = 3
    stride: int = 1
    expand: int = 6
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        h = x
        if self.expand != 1:
            h = ConvBNAct(inp * self.expand, kernel=1, act=nn.swish,
                          dtype=self.dtype)(h, train)
        h = ConvBNAct(h.shape[-1], kernel=self.kernel, stride=self.stride,
                      groups=h.shape[-1], act=nn.swish, dtype=self.dtype)(h, train)
        h = SqueezeExcite(max(1, int(inp * self.se_ratio)), dtype=self.dtype)(h)
        h = ConvBNAct(self.features, kernel=1, act=None, dtype=self.dtype)(h, train)
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


class ASPPPooling(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        p = jnp.mean(x, axis=(1, 2), keepdims=True)
        p = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(p)
        p = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(p)
        p = nn.relu(p)
        return jnp.broadcast_to(p, (x.shape[0], h, w, self.features))


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference convolutions.py:218-271).

    Default rates match the reference's DeepLabHead instantiation
    (convolutions.py:276: atrous_rates=[12, 24, 36])."""

    features: int
    rates: Sequence[int] = (12, 24, 36)
    torch_parity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        eps = 1e-5 if self.torch_parity else 1e-3
        outs = [ConvBNAct(self.features, kernel=1, bn_eps=eps,
                          dtype=self.dtype)(x, train)]
        for rate in self.rates:
            h = nn.Conv(self.features, (3, 3), padding="SAME",
                        kernel_dilation=rate, use_bias=False, dtype=self.dtype)(x)
            h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(h)
            outs.append(nn.relu(h))
        outs.append(ASPPPooling(self.features, dtype=self.dtype)(x, train))
        h = jnp.concatenate(outs, axis=-1)
        h = ConvBNAct(self.features, kernel=1, bn_eps=eps,
                      dtype=self.dtype)(h, train)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        return h


class DeepLabHead(nn.Module):
    """ASPP -> 3x3 conv-BN-relu -> 1x1 conv (reference convolutions.py:
    274-282); layer-for-layer identical to the torch module so reference
    checkpoints import weight-exact (tools/import_torch_ckpt.py)."""

    features: int
    hidden: int = 64
    torch_parity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        eps = 1e-5 if self.torch_parity else 1e-3
        x = ASPP(self.hidden, torch_parity=self.torch_parity,
                 dtype=self.dtype)(x, train)
        x = ConvBNAct(self.hidden, kernel=3, bn_eps=eps, dtype=self.dtype)(x, train)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)
        return x


class UpsamplingConcat(nn.Module):
    """Upsample x2, concat skip, two conv-bn-relu blocks
    (reference convolutions.py:183-201)."""

    features: int
    torch_parity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        eps = 1e-5 if self.torch_parity else 1e-3
        x = resize_bilinear(x, (skip.shape[1], skip.shape[2]))
        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNAct(self.features, kernel=3, bn_eps=eps, dtype=self.dtype)(x, train)
        x = ConvBNAct(self.features, kernel=3, bn_eps=eps, dtype=self.dtype)(x, train)
        return x


class BasicBlock(nn.Module):
    """ResNet-18 basic block. With torch_parity, padding/eps follow
    torchvision's resnet (symmetric k//2 padding, BN eps 1e-5) so imported
    reference checkpoints reproduce torch activations exactly."""

    features: int
    stride: int = 1
    torch_parity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        eps = 1e-5 if self.torch_parity else 1e-3
        pad3 = _torch_pad(3) if self.torch_parity else "SAME"
        identity = x
        h = ConvBNAct(self.features, kernel=3, stride=self.stride,
                      bn_eps=eps, padding=pad3, dtype=self.dtype)(x, train)
        h = ConvBNAct(self.features, kernel=3, act=None, bn_eps=eps,
                      padding=pad3, dtype=self.dtype)(h, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBNAct(self.features, kernel=1, stride=self.stride,
                                 act=None, bn_eps=eps, dtype=self.dtype)(x, train)
        return nn.relu(h + identity)


# ---------------------------------------------------------------------------
# Transformer layers (torch post-LN semantics)
# ---------------------------------------------------------------------------


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer: x = LN(x + attn(x)); x = LN(x + ffn(x)).

    Attention weights are sown into the 'intermediates' collection when that
    collection is mutable — apply(..., mutable=['intermediates']) retrieves
    them for visualization (the reference hooks the last encoder layer's
    attention for its overlay, agent/parking_agent.py:71-91).
    """

    dim: int
    heads: int
    ffn_dim: int = 2048
    dropout: float = 0.0
    ln_eps: float = 1e-6  # torch nn.LayerNorm default is 1e-5 (torch_parity)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=not train,
        )(x, x, mask=mask, sow_weights=True)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32)(x + nn.Dropout(
            self.dropout, deterministic=not train)(attn))
        h = nn.Dense(self.ffn_dim, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32)(x + nn.Dropout(
            self.dropout, deterministic=not train)(h))
        return x


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer: masked self-attn, cross-attn, FFN."""

    dim: int
    heads: int
    ffn_dim: int = 2048
    dropout: float = 0.0
    ln_eps: float = 1e-6  # torch nn.LayerNorm default is 1e-5 (torch_parity)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, train: bool = False, self_mask=None,
                 cross_mask=None):
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=not train,
        )(tgt, tgt, mask=self_mask)
        tgt = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32)(tgt + nn.Dropout(
            self.dropout, deterministic=not train)(sa))
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=not train,
        )(tgt, memory, mask=cross_mask)
        tgt = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32)(tgt + nn.Dropout(
            self.dropout, deterministic=not train)(ca))
        h = nn.Dense(self.ffn_dim, dtype=self.dtype)(tgt)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        tgt = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32)(tgt + nn.Dropout(
            self.dropout, deterministic=not train)(h))
        return tgt
