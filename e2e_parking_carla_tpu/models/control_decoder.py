"""Autoregressive control-token decoder.

Mirrors the reference ControlPredict (model/control_predict.py:8-75): token
embedding over the 204 vocab, learned positional embedding of length
tf_de_tgt_dim-1 = 14, a 4-layer post-LN transformer decoder cross-attending
to the fused BEV tokens, causal + PAD-key masking, and a linear head to
vocab logits.

Two paths:
* `__call__` — teacher-forced training pass over the shifted target,
* `decode` — greedy generation as a `lax.scan` over token positions. The
  reference re-runs the full decoder per generated token under a Python loop
  (parking_model.py:72-78); here the loop is traced, so closed-loop
  evaluation jit-compiles into the same XLA program as the simulator. The
  sequence is 15 tokens, so a KV cache buys nothing — each scan step runs
  the full (padded, masked) decoder, exactly matching the training compute
  pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from e2e_parking_carla_tpu.config import ModelConfig
from e2e_parking_carla_tpu.models.layers import TransformerDecoderLayer


def causal_mask(L):
    return jnp.tril(jnp.ones((L, L), bool))


class ControlDecoder(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.embedding = nn.Embed(cfg.token_nums, cfg.tf_de_dim, dtype=self.dtype)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, cfg.tf_de_tgt_dim - 1, cfg.tf_de_dim))
        self.layers = [
            TransformerDecoderLayer(
                dim=cfg.tf_de_dim, heads=cfg.tf_de_heads,
                ffn_dim=cfg.tf_de_ffn_dim, dropout=cfg.tf_de_dropout,
                ln_eps=1e-5 if getattr(cfg, "torch_parity", False) else 1e-6,
                dtype=self.dtype, name=f"layer_{i}")
            for i in range(cfg.tf_de_layers)
        ]
        self.out = nn.Dense(cfg.token_nums, dtype=self.dtype)
        self.dropout = nn.Dropout(cfg.tf_de_dropout)

    def _run(self, tgt_tokens, memory, train: bool):
        """tgt_tokens: (B, L) int32 (L = tf_de_tgt_dim - 1). Logits (B, L, V)."""
        cfg = self.cfg
        B, L = tgt_tokens.shape
        h = self.embedding(tgt_tokens) + self.pos_embed[:, :L]
        h = self.dropout(h, deterministic=not train)

        # self-attn mask: causal AND keys not PAD
        not_pad = tgt_tokens != cfg.pad_token  # (B, L)
        mask = causal_mask(L)[None, None] & not_pad[:, None, None, :]
        for layer in self.layers:
            h = layer(h, memory, train=train, self_mask=mask)
        return self.out(h)

    def __call__(self, memory, gt_sequence, train: bool = False):
        """Teacher-forced pass: gt_sequence (B, tf_de_tgt_dim) including BOS
        ... EOS PAD; predicts positions 1..L (reference
        control_predict.py:49-58)."""
        return self._run(gt_sequence[:, :-1], memory, train)

    def decode(self, memory, prefix, n_new: int):
        """Greedy decode: append `n_new` argmax tokens to `prefix` (B, L0).

        Matches ControlPredict.predict (control_predict.py:60-75): the tail
        is PAD-filled to length 14, the logit at the last real position is
        argmax'd. Returns (B, L0 + n_new) tokens.
        """
        cfg = self.cfg
        B, L0 = prefix.shape
        L = cfg.tf_de_tgt_dim - 1
        tokens = jnp.concatenate(
            [prefix, jnp.full((B, L - L0), cfg.pad_token, jnp.int32)], axis=1)
        # inherit `memory`'s varying axes (shard_map + check_vma: the scan
        # body output varies over the data axis via memory, so a
        # constant-built carry init is rejected; memory is finite, *0 == 0)
        tokens = tokens + (memory[:, 0, 0] * 0).astype(jnp.int32)[:, None]

        def step(tokens, i):
            logits = self._run(tokens, memory, train=False)  # (B, L, V)
            pos = L0 + i - 1  # logit at the last real position
            nxt = jnp.argmax(
                jax.lax.dynamic_index_in_dim(logits, pos, axis=1, keepdims=False),
                axis=-1).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_index_in_dim(tokens, nxt, L0 + i, axis=1)
            return tokens, nxt

        # positions are traced constants per unrolled scan step; use a scan
        # over a static-length index array
        tokens, _ = jax.lax.scan(step, tokens, jnp.arange(n_new))
        return tokens[:, : L0 + n_new]

    def decode_ensemble(self, memory_a, memory_b, prefix, n_new: int):
        """Joint greedy decode over two memories, where memory_b encodes
        the MIRRORED observation (mirror module): one coherent argmax chain
        over the average of the two streams' log-probabilities, with the
        b-stream's steer logits permuted into a-space (and the chosen token
        mirrored back into the b-stream's prefix). Guarantees by symmetry
        that the ensembled policy is exactly chirality-balanced:
        predict(mirror(obs)) == mirror(predict(obs))."""
        from e2e_parking_carla_tpu import mirror as mirror_lib

        cfg = self.cfg
        B, L0 = prefix.shape
        L = cfg.tf_de_tgt_dim - 1
        perm = jnp.asarray(mirror_lib.STEER_TOKEN_PERM)

        def pad_to(p):
            return jnp.concatenate(
                [p, jnp.full((B, L - L0), cfg.pad_token, jnp.int32)], axis=1)

        tokens_a = pad_to(prefix)
        tokens_b = pad_to(mirror_lib.mirror_sequence(prefix))
        # inherit the memories' varying axes (see decode(); same check_vma
        # constraint on the scan carry init)
        vz = (memory_a[:, 0, 0] * 0 + memory_b[:, 0, 0] * 0).astype(
            jnp.int32)[:, None]
        tokens_a = tokens_a + vz
        tokens_b = tokens_b + vz

        def step(carry, i):
            ta, tb = carry
            idx = L0 + i  # token index being generated
            pos = idx - 1  # logit at the last real position
            la = self._run(ta, memory_a, train=False)
            lb = self._run(tb, memory_b, train=False)
            la = jax.lax.dynamic_index_in_dim(la, pos, axis=1, keepdims=False)
            lb = jax.lax.dynamic_index_in_dim(lb, pos, axis=1, keepdims=False)
            steer_here = mirror_lib.is_steer_index(idx)
            lb = jnp.where(steer_here, lb[:, perm], lb)
            avg = jax.nn.log_softmax(la.astype(jnp.float32), axis=-1) \
                + jax.nn.log_softmax(lb.astype(jnp.float32), axis=-1)
            nxt = jnp.argmax(avg, axis=-1).astype(jnp.int32)
            nxt_b = jnp.where(steer_here, perm[nxt], nxt)
            ta = jax.lax.dynamic_update_index_in_dim(ta, nxt, idx, axis=1)
            tb = jax.lax.dynamic_update_index_in_dim(tb, nxt_b, idx, axis=1)
            return (ta, tb), nxt

        (tokens_a, _), _ = jax.lax.scan(
            step, (tokens_a, tokens_b), jnp.arange(n_new))
        return tokens_a[:, : L0 + n_new]


class MLPControlDecoder(nn.Module):
    """Non-autoregressive MLP decoder — the paper's Table III ablation
    ("MLP decoder": TSR 83.33 vs 91.41 for the transformer; the reference
    repo ships no code for it, so the design here is the natural one):
    mean-pool the fused BEV tokens and regress all 12 control-token logits
    in one shot. API-compatible with ControlDecoder (same logits layout,
    same decode signature) so ParkingModel and the evaluator are agnostic.
    """

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def _logits(self, memory):
        cfg = self.cfg
        L = cfg.tf_de_tgt_dim - 1
        h = jnp.mean(memory, axis=1)  # (B, D)
        h = nn.Dense(cfg.tf_de_ffn_dim, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(cfg.tf_de_ffn_dim, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(L * cfg.token_nums, dtype=self.dtype)(h)
        return h.reshape(h.shape[0], L, cfg.token_nums)

    def __call__(self, memory, gt_sequence, train: bool = False):
        del gt_sequence, train  # non-autoregressive: no teacher forcing
        return self._logits(memory)

    def decode(self, memory, prefix, n_new: int):
        logits = self._logits(memory)
        B, L0 = prefix.shape
        new = jnp.argmax(logits[:, L0 - 1 : L0 - 1 + n_new], axis=-1)
        return jnp.concatenate([prefix, new.astype(jnp.int32)], axis=1)

    def decode_ensemble(self, memory_a, memory_b, prefix, n_new: int):
        """Mirror-ensembled variant (see ControlDecoder.decode_ensemble);
        non-autoregressive, so the two streams average position-wise."""
        from e2e_parking_carla_tpu import mirror as mirror_lib

        la = self._logits(memory_a).astype(jnp.float32)
        lb = self._logits(memory_b).astype(jnp.float32)
        B, L0 = prefix.shape
        # logits position j predicts token index j + 1
        steer_pos = mirror_lib.is_steer_index(jnp.arange(la.shape[1]) + 1)
        perm = jnp.asarray(mirror_lib.STEER_TOKEN_PERM)
        lb = jnp.where(steer_pos[None, :, None], lb[:, :, perm], lb)
        avg = jax.nn.log_softmax(la, axis=-1) + jax.nn.log_softmax(lb, axis=-1)
        new = jnp.argmax(avg[:, L0 - 1 : L0 - 1 + n_new], axis=-1)
        return jnp.concatenate([prefix, new.astype(jnp.int32)], axis=1)
