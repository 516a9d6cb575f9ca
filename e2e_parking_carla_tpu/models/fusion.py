"""Feature fusion: ego-motion embedding + transformer encoder over BEV tokens.

Mirrors the reference FeatureFusion (model/feature_fusion.py:8-51): a 3-layer
MLP maps (speed, acc_x, acc_y) to a 256-vector whose i-th component is
appended (duplicated into 2 channels) to the i-th BEV token, giving 256
tokens of dim 258; learned positional embedding; 4-layer post-LN encoder.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from e2e_parking_carla_tpu.config import ModelConfig
from e2e_parking_carla_tpu.models.layers import TransformerEncoderLayer


class FeatureFusion(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bev_tokens, ego_motion, train: bool = False):
        """bev_tokens: (B, L, 256); ego_motion: (B, 1, 3) or (B, 3).
        Returns fused (B, L, tf_en_dim)."""
        cfg = self.cfg
        L = bev_tokens.shape[1]  # tf_en_bev_length for the parity config
        if ego_motion.ndim == 2:
            ego_motion = ego_motion[:, None, :]

        unit = L // 4
        m = nn.Dense(unit, dtype=self.dtype)(ego_motion)
        m = nn.relu(m)
        m = nn.Dense(unit * 2, dtype=self.dtype)(m)
        m = nn.relu(m)
        m = nn.Dense(L, dtype=self.dtype)(m)
        m = nn.relu(m)  # (B, 1, L)
        # token i gets motion component i, duplicated into the 2 extra dims
        m = jnp.swapaxes(m, 1, 2)  # (B, L, 1)
        motion_cols = jnp.broadcast_to(m, (m.shape[0], L, cfg.tf_en_dim - 256))

        fused = jnp.concatenate([bev_tokens, motion_cols], axis=-1)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, L, cfg.tf_en_dim),
        )
        fused = fused + pos
        fused = nn.Dropout(cfg.tf_en_dropout, deterministic=not train)(fused)
        ln_eps = 1e-5 if getattr(cfg, "torch_parity", False) else 1e-6
        for _ in range(cfg.tf_en_layers):
            fused = TransformerEncoderLayer(
                dim=cfg.tf_en_dim, heads=cfg.tf_en_heads,
                ffn_dim=cfg.tf_en_ffn_dim, dropout=cfg.tf_en_dropout,
                ln_eps=ln_eps, dtype=self.dtype,
            )(fused, train)
        return fused
