"""Torch-checkpoint import tests.

The released reference checkpoint itself is a download (README.md:36) not
bundled in the repo, so these tests validate the importer two ways:

1. round-trip coverage: a synthesized reference-shaped state dict converts
   into a tree structurally identical to the flax model's own init (every
   leaf assigned exactly once, every torch key consumed);
2. numeric parity: real torch layers (plain torch.nn, available on the CPU
   path) are converted and must produce the same outputs as the flax
   modules they map onto — this pins the weight-layout conventions (conv
   transposes, in_proj splits, head ordering) AND the post-LN transformer
   semantics against torch's implementation.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from e2e_parking_carla_tpu.data.torch_import import (
    _decoder_layer_rules,
    _encoder_layer_rules,
    _transform,
    build_rules,
    convert_state_dict,
    strip_prefix,
    synthesize_state_dict,
)
from e2e_parking_carla_tpu.models.layers import (
    TransformerDecoderLayer,
    TransformerEncoderLayer,
)
from e2e_parking_carla_tpu.models.parking_model import ParkingModel

from tests.test_model import SIM, TINY, tiny_batch


def _init_tiny():
    model = ParkingModel(TINY, SIM)
    batch = tiny_batch(B=1)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["images"], batch["ego_motion"],
        batch["target_point"], batch["gt_control"], train=False))()
    return model, batch, variables


def _tree_paths(tree):
    return {
        tuple(str(p.key) for p in path): np.shape(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_roundtrip_covers_full_tree():
    """Synthesized torch dict -> convert -> exactly the flax init tree."""
    _, _, variables = _init_tiny()
    sd = synthesize_state_dict(TINY, variables)
    params, stats = convert_state_dict(sd, TINY)
    assert _tree_paths(params) == _tree_paths(variables["params"])
    assert _tree_paths(stats) == _tree_paths(variables["batch_stats"])


def test_missing_and_leftover_keys_raise():
    _, _, variables = _init_tiny()
    sd = synthesize_state_dict(TINY, variables)
    k = next(iter(sd))
    missing = dict(sd)
    del missing[k]
    with pytest.raises(KeyError):
        convert_state_dict(missing, TINY)
    extra = dict(sd)
    extra["bev_model.cam_encoder.backbone._conv_head.weight"] = np.zeros(3)
    with pytest.raises(ValueError):
        convert_state_dict(extra, TINY)


def test_lightning_prefix_stripped():
    sd = {"parking_model.segmentation_head.c5_conv.weight": 1,
          "loss.weight": 2}
    assert strip_prefix(sd) == {"segmentation_head.c5_conv.weight": 1}


def _convert_layer(rules, torch_module, heads):
    sd = {k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    tree = {}
    for rule in rules:
        w = np.asarray(sd[rule.torch_key], np.float32)
        v = _transform(rule.kind, rule.aux, w, heads)
        node = tree
        for k in rule.path[:-1]:
            node = node.setdefault(k, {})
        node[rule.path[-1]] = jnp.asarray(v)
    return tree


def test_encoder_layer_matches_torch():
    """Converted torch nn.TransformerEncoderLayer == flax layer, to fp32
    tolerance (validates in_proj split, head ordering, post-LN placement)."""
    E, H = 64, 4
    tl = torch.nn.TransformerEncoderLayer(
        d_model=E, nhead=H, dim_feedforward=128, dropout=0.0,
        batch_first=True).eval()
    rules = _encoder_layer_rules("", ("layer",))
    params = _convert_layer(rules, tl, H)["layer"]

    x = np.random.default_rng(0).normal(0, 1, (2, 7, E)).astype(np.float32)
    with torch.no_grad():
        ref = tl(torch.from_numpy(x)).numpy()
    fl = TransformerEncoderLayer(dim=E, heads=H, ffn_dim=128)
    out = fl.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_decoder_layer_matches_torch():
    E, H = 64, 4
    tl = torch.nn.TransformerDecoderLayer(
        d_model=E, nhead=H, dim_feedforward=128, dropout=0.0,
        batch_first=True).eval()
    rules = _decoder_layer_rules("", ("layer",))
    params = _convert_layer(rules, tl, H)["layer"]

    rng = np.random.default_rng(1)
    tgt = rng.normal(0, 1, (2, 5, E)).astype(np.float32)
    mem = rng.normal(0, 1, (2, 9, E)).astype(np.float32)
    with torch.no_grad():
        ref = tl(torch.from_numpy(tgt), torch.from_numpy(mem)).numpy()
    fl = TransformerDecoderLayer(dim=E, heads=H, ffn_dim=128)
    out = fl.apply({"params": params}, jnp.asarray(tgt), jnp.asarray(mem))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_conv_and_linear_transforms_match_torch():
    """Plain conv / depthwise conv / linear layouts."""
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 8, 8, 6)).astype(np.float32)

    conv = torch.nn.Conv2d(6, 10, 3, padding=1, bias=False)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    k = _transform("conv", 0, conv.weight.detach().numpy(), 0)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)

    dw = torch.nn.Conv2d(6, 6, 3, padding=1, groups=6, bias=False)
    with torch.no_grad():
        ref = dw(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    k = _transform("conv", 0, dw.weight.detach().numpy(), 0)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        feature_group_count=6,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)

    lin = torch.nn.Linear(6, 4)
    v = rng.normal(0, 1, (5, 6)).astype(np.float32)
    with torch.no_grad():
        ref = lin(torch.from_numpy(v)).numpy()
    out = v @ _transform("linear", 0, lin.weight.detach().numpy(), 0) \
        + lin.bias.detach().numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_imported_weights_run_forward():
    """A fully synthesized import must drive the real model end to end."""
    model, batch, variables = _init_tiny()
    sd = synthesize_state_dict(TINY, variables)
    params, stats = convert_state_dict(sd, TINY)
    logits, seg, depth = model.apply(
        {"params": params, "batch_stats": stats},
        batch["images"], batch["ego_motion"], batch["target_point"],
        batch["gt_control"], train=False)
    assert bool(jnp.isfinite(logits).all())
    assert bool(jnp.isfinite(seg).all())
