"""Control-token codec, vectorized for JAX.

The core data contract of the framework: continuous vehicle controls
(throttle/brake, steer, reverse) <-> discrete tokens consumed/produced by the
transformer decoder.

Behavioral spec (reference: dataset/carla_dataset.py:67-111 `tokenize` /
`detokenize`, :162-164 special tokens; loss/control_loss.py:69-70 hardcodes
the 101 reverse boundary):

* vocab = ``token_nums`` (204); ``valid = token_nums - 4`` (200) value tokens
* throttle/brake fuse into one token: brake>0 -> ``floor(100*(1-brake))`` in
  [0, 100); else ``floor(100*(throttle+1))`` in [100, 200]
* steer in [-1, 1] -> ``floor((steer+1)*100)`` in [0, 200]
* reverse {0,1} -> {0, 200}
* BOS=201, EOS=202, PAD=203
* a supervision sequence is BOS + future_frames*3 tokens + EOS + PAD
  (length 15 = ``tf_de_tgt_dim``, carla_dataset.py:322-341)

Unlike the reference's per-scalar Python implementation, everything here is a
pure jnp op over arrays of any batch shape, usable inside jit/vmap/scan.
"""

from __future__ import annotations

import jax.numpy as jnp

TOKEN_NUMS = 204
VALID_TOKEN = TOKEN_NUMS - 4  # 200
HALF_TOKEN = VALID_TOKEN // 2  # 100
BOS = TOKEN_NUMS - 3  # 201
EOS = TOKEN_NUMS - 2  # 202
PAD = TOKEN_NUMS - 1  # 203


def tokenize(throttle, brake, steer, reverse):
    """Tokenize control signals. All args broadcastable arrays.

    throttle, brake in [0,1]; steer in [-1,1]; reverse in {0,1}.
    Returns int32 array shaped (*batch, 3): [throttle_brake, steer, reverse].
    """
    throttle = jnp.asarray(throttle, jnp.float32)
    brake = jnp.asarray(brake, jnp.float32)
    steer = jnp.asarray(steer, jnp.float32)
    reverse = jnp.asarray(reverse, jnp.float32)

    tb = jnp.where(
        brake != 0.0,
        jnp.floor(HALF_TOKEN * (1.0 - brake)),
        jnp.floor(HALF_TOKEN * (throttle + 1.0)),
    )
    st = jnp.floor((steer + 1.0) * HALF_TOKEN)
    rv = jnp.round(reverse) * VALID_TOKEN
    out = jnp.stack([tb, st, rv], axis=-1)
    return jnp.clip(out, 0, VALID_TOKEN).astype(jnp.int32)


def detokenize(tokens):
    """Invert `tokenize`. tokens: int array (*batch, 3).

    Returns (throttle, brake, steer, reverse) float32/bool arrays (*batch,).
    Matches the reference's detokenize: tb == HALF maps to throttle=brake=0.
    """
    tokens = jnp.asarray(tokens)
    tb = tokens[..., 0].astype(jnp.float32)
    st = tokens[..., 1].astype(jnp.float32)
    rv = tokens[..., 2]

    throttle = jnp.where(tb > HALF_TOKEN, tb / HALF_TOKEN - 1.0, 0.0)
    brake = jnp.where(tb > HALF_TOKEN, 0.0, -(tb / HALF_TOKEN - 1.0))
    steer = st / HALF_TOKEN - 1.0
    reverse = rv > HALF_TOKEN
    return throttle, brake, steer, reverse


def detokenize_acc(tb_tokens):
    """Signed acceleration command in [-1,1] from a throttle/brake token.

    Positive = throttle, negative = brake (reference:
    loss/control_loss.py:33-38 folds both branches to a magnitude; here we
    keep the sign so SmoothL1 against the recorded signed value matches
    `add_raw_control`, carla_dataset.py:148-153).
    """
    tb = jnp.asarray(tb_tokens, jnp.float32)
    return tb / HALF_TOKEN - 1.0


def build_sequence(frame_tokens, seq_len: int = 15):
    """BOS + flattened frame tokens + EOS + PAD padding.

    frame_tokens: int32 (*batch, n_frames, 3). Returns (*batch, seq_len).
    """
    frame_tokens = jnp.asarray(frame_tokens, jnp.int32)
    *batch, n_frames, three = frame_tokens.shape
    assert three == 3
    flat = frame_tokens.reshape(*batch, n_frames * 3)
    bos = jnp.full((*batch, 1), BOS, jnp.int32)
    eos = jnp.full((*batch, 1), EOS, jnp.int32)
    n_pad = seq_len - (n_frames * 3 + 2)
    assert n_pad >= 0, "sequence too long for seq_len"
    pad = jnp.full((*batch, n_pad), PAD, jnp.int32)
    return jnp.concatenate([bos, flat, eos, pad], axis=-1)


def split_sequence(seq, n_frames: int = 4):
    """Extract the (*batch, n_frames, 3) frame tokens from a full sequence."""
    seq = jnp.asarray(seq)
    flat = seq[..., 1 : 1 + n_frames * 3]
    return flat.reshape(*seq.shape[:-1], n_frames, 3)


def reverse_probability(logits):
    """P(reverse) from 204-way logits: probability mass at tokens >= 101
    within the full softmax (reference: loss/control_loss.py:68-75)."""
    import jax

    probs = jax.nn.softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    p_rev = probs[..., HALF_TOKEN + 1 :].sum(axis=-1)
    p_fwd = probs[..., : HALF_TOKEN + 1].sum(axis=-1)
    return p_fwd, p_rev
