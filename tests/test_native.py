"""Native episode-codec tests: C++ (when built) vs numpy fallback parity."""

import numpy as np
import pytest

from e2e_parking_carla_tpu import native


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


def test_depth_round_trip(rng):
    d = rng.uniform(0, 900, (64, 64)).astype(np.float32)
    dec = native.depth_decode(native.depth_encode(d))
    assert np.abs(dec - d).max() < 0.001


def test_depth_matches_reference_decoder(rng):
    """Encoding must invert the reference's get_depth formula
    (carla_dataset.py:126-129)."""
    d = rng.uniform(0, 100, (32, 32)).astype(np.float32)
    enc = native.depth_encode(d).astype(np.float32)
    norm = (enc[..., 0] + enc[..., 1] * 256.0 + enc[..., 2] * 65536.0) / (256 ** 3 - 1)
    np.testing.assert_allclose(1000.0 * norm, d, atol=1e-3)


def test_bev_pack_round_trip(rng):
    bev = (rng.rand(15, 50, 50) > 0.5).astype(np.uint8)
    assert (native.bev_unpack(native.bev_pack(bev)) == bev).all()


def test_bev_pack_matches_reference_bit_layout():
    """Channel 5 (vehicles) lands in green bit 7 -> grayscale 75, the value
    ProcessSemantic thresholds on (tools.py:17-23, carla_dataset.py:453)."""
    bev = np.zeros((15, 4, 4), np.uint8)
    bev[5] = 1
    packed = native.bev_pack(bev)
    assert (packed[1] == 128).all() and (packed[0] == 0).all()
    # PIL 'L' conversion: L = 0.299R + 0.587G + 0.114B -> 75
    assert int(0.587 * 128) == 75


def test_normalize_crop(rng):
    rgb = rng.randint(0, 256, (300, 400, 3), np.uint8)
    out = native.normalize_crop(rgb, 256)
    assert out.shape == (256, 256, 3)
    ref = (rgb[22:278, 72:328].astype(np.float32) / 255.0
           - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=1e-5)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_matches_fallback(rng, monkeypatch):
    d = rng.uniform(0, 500, (100,)).astype(np.float32)
    enc_native = native.depth_encode(d)
    monkeypatch.setattr(native, "_load", lambda: None)
    enc_np = native.depth_encode(d)
    np.testing.assert_array_equal(enc_native, enc_np)
