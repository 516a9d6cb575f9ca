"""Token codec tests: parity with the reference's scalar tokenize/detokenize
(dataset/carla_dataset.py:67-111) plus vectorized round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2e_parking_carla_tpu import tokens


def ref_tokenize(throttle, brake, steer, reverse, token_nums=204):
    """Scalar re-implementation of the reference's tokenize for parity checks."""
    valid_token = token_nums - 4
    half_token = valid_token / 2
    if brake != 0.0:
        tb = int(half_token * (-brake + 1))
    else:
        tb = int(half_token * (throttle + 1))
    st = int((steer + 1) * half_token)
    rv = int(reverse * valid_token)
    return [tb, st, rv]


def ref_detokenize(token_list, token_nums=204):
    valid_token = token_nums - 4
    half_token = float(valid_token / 2)
    if token_list[0] > half_token:
        throttle = token_list[0] / half_token - 1
        brake = 0.0
    else:
        throttle = 0.0
        brake = -(token_list[0] / half_token - 1)
    steer = (token_list[1] / half_token) - 1
    reverse = token_list[2] > half_token
    return [throttle, brake, steer, reverse]


def test_special_tokens():
    assert tokens.BOS == 201
    assert tokens.EOS == 202
    assert tokens.PAD == 203
    assert tokens.VALID_TOKEN == 200
    assert tokens.HALF_TOKEN == 100


@pytest.mark.parametrize(
    "throttle,brake,steer,reverse",
    [
        (0.0, 0.0, 0.0, 0),
        (1.0, 0.0, 1.0, 0),
        (0.0, 1.0, -1.0, 1),
        (0.5, 0.0, 0.25, 1),
        (0.0, 0.3, -0.7, 0),
        (0.123, 0.0, 0.987, 1),
    ],
)
def test_tokenize_matches_reference(throttle, brake, steer, reverse):
    ours = np.asarray(tokens.tokenize(throttle, brake, steer, reverse))
    theirs = np.asarray(ref_tokenize(throttle, brake, steer, reverse))
    np.testing.assert_array_equal(ours, theirs)


def test_tokenize_random_parity():
    rng = np.random.RandomState(0)
    for _ in range(200):
        throttle = float(rng.uniform(0, 1))
        brake = float(rng.uniform(0, 1)) if rng.rand() < 0.5 else 0.0
        if brake > 0:
            throttle = 0.0
        steer = float(rng.uniform(-1, 1))
        reverse = int(rng.rand() < 0.5)
        ours = np.asarray(tokens.tokenize(throttle, brake, steer, reverse))
        theirs = np.asarray(ref_tokenize(throttle, brake, steer, reverse))
        np.testing.assert_array_equal(ours, theirs, err_msg=f"{throttle},{brake},{steer},{reverse}")


def test_detokenize_matches_reference():
    rng = np.random.RandomState(1)
    toks = rng.randint(0, 201, size=(100, 3))
    th, br, st, rv = tokens.detokenize(toks)
    for i in range(100):
        t, b, s, r = ref_detokenize(list(toks[i]))
        assert abs(float(th[i]) - t) < 1e-6
        assert abs(float(br[i]) - b) < 1e-6
        assert abs(float(st[i]) - s) < 1e-6
        assert bool(rv[i]) == bool(r)


def test_round_trip_quantization_error():
    """detokenize(tokenize(x)) is within one quantization step of x."""
    rng = np.random.RandomState(2)
    throttle = rng.uniform(0, 1, 64).astype(np.float32)
    steer = rng.uniform(-1, 1, 64).astype(np.float32)
    reverse = (rng.rand(64) < 0.5).astype(np.float32)
    toks = tokens.tokenize(throttle, np.zeros(64), steer, reverse)
    th, br, st, rv = tokens.detokenize(toks)
    assert np.all(np.abs(np.asarray(th) - throttle) <= 1.0 / tokens.HALF_TOKEN + 1e-6)
    assert np.all(np.asarray(br) == 0)
    assert np.all(np.abs(np.asarray(st) - steer) <= 1.0 / tokens.HALF_TOKEN + 1e-6)
    np.testing.assert_array_equal(np.asarray(rv), reverse.astype(bool))


def test_build_split_sequence():
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 201, size=(2, 4, 3)).astype(np.int32)
    seq = tokens.build_sequence(frames, seq_len=15)
    assert seq.shape == (2, 15)
    assert np.all(np.asarray(seq[:, 0]) == tokens.BOS)
    assert np.all(np.asarray(seq[:, 13]) == tokens.EOS)
    assert np.all(np.asarray(seq[:, 14]) == tokens.PAD)
    back = tokens.split_sequence(seq, n_frames=4)
    np.testing.assert_array_equal(np.asarray(back), frames)


def test_tokenize_jit_and_vmap():
    f = jax.jit(tokens.tokenize)
    out = f(jnp.full((8,), 0.5), jnp.zeros(8), jnp.zeros(8), jnp.ones(8))
    assert out.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(out[0]), [150, 100, 200])


def test_reverse_probability_sums_to_one():
    rng = np.random.RandomState(4)
    logits = rng.randn(5, 204).astype(np.float32)
    p_fwd, p_rev = tokens.reverse_probability(logits)
    np.testing.assert_allclose(np.asarray(p_fwd + p_rev), 1.0, atol=1e-5)
