"""Reference-checkpoint import: torch Lightning state dict -> flax variables.

The reference releases a pretrained Lightning checkpoint (~75% closed-loop
success, /root/reference/README.md:36) whose weights live under the
`parking_model.` prefix (agent/parking_agent.py:257-270 strips it the same
way). This module maps every tensor of that state dict onto this package's
flax parameter tree, so the released policy can run on TPU unchanged.

The mapping is RULE-GENERATED, not hand-listed: `build_rules` walks the same
structural recipe as the flax modules (EfficientNet stage layout, DeepLab
head, resnet basic blocks, torch-layout transformer layers) and emits one
`Rule` per flax leaf. That gives two invariants the tests enforce:
every flax leaf is produced by exactly one rule, and every torch key is
either consumed or explicitly ignored (frozen buffers, the reference's
never-used resnet layer4, num_batches_tracked counters).

Weight-layout conventions handled here:
  conv    torch (O, I, kh, kw)            -> flax (kh, kw, I, O)
  dwconv  torch (C, 1, kh, kw), groups=C  -> flax (kh, kw, 1, C)
  linear  torch (O, I)                    -> flax (I, O)
  mha     torch in_proj_weight (3E, E)    -> flax q/k/v kernels (E, H, Dh)
          torch out_proj.weight (E, E)    -> flax out kernel (H, Dh, E)
  batchnorm weight/bias/running_mean/var  -> scale/bias + batch_stats
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import numpy as np

from e2e_parking_carla_tpu.config import ModelConfig
from e2e_parking_carla_tpu.models.efficientnet import (
    _B0_STAGES,
    _MULTIPLIERS,
    _round_repeats,
)


class Rule(NamedTuple):
    torch_key: str
    collection: str  # 'params' | 'batch_stats'
    path: Tuple[str, ...]
    kind: str  # conv | linear | copy | mha_w | mha_b | mha_out
    aux: int = 0  # for mha_w / mha_b: 0=q, 1=k, 2=v


# torch keys that exist in reference checkpoints but have no flax analog
IGNORED_PREFIXES = (
    "bev_model.bev_res",
    "bev_model.bev_start_pos",
    "bev_model.bev_dim",
    "bev_model.frustum",
    "bev_encoder.layer4.",  # registered but never run (bev_encoder.py:21,31-33)
)
IGNORED_SUFFIXES = ("num_batches_tracked",)


def _bn(t: str, path: Tuple[str, ...]) -> List[Rule]:
    """BatchNorm: torch module prefix `t` -> flax BatchNorm_0 under `path`."""
    p = path + ("BatchNorm_0",)
    return [
        Rule(t + ".weight", "params", p + ("scale",), "copy"),
        Rule(t + ".bias", "params", p + ("bias",), "copy"),
        Rule(t + ".running_mean", "batch_stats", p + ("mean",), "copy"),
        Rule(t + ".running_var", "batch_stats", p + ("var",), "copy"),
    ]


def _conv_bn(tconv: str, tbn: str, path: Tuple[str, ...]) -> List[Rule]:
    """ConvBNAct: bias-free conv + BN."""
    return [Rule(tconv + ".weight", "params", path + ("Conv_0", "kernel"), "conv")] \
        + _bn(tbn, path)


def _mha(t: str, path: Tuple[str, ...]) -> List[Rule]:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    rules = []
    for i, name in enumerate(("query", "key", "value")):
        rules.append(Rule(t + "in_proj_weight", "params",
                          path + (name, "kernel"), "mha_w", i))
        rules.append(Rule(t + "in_proj_bias", "params",
                          path + (name, "bias"), "mha_b", i))
    rules.append(Rule(t + "out_proj.weight", "params",
                      path + ("out", "kernel"), "mha_out"))
    rules.append(Rule(t + "out_proj.bias", "params",
                      path + ("out", "bias"), "copy"))
    return rules


def _ln(t: str, path: Tuple[str, ...]) -> List[Rule]:
    return [
        Rule(t + ".weight", "params", path + ("scale",), "copy"),
        Rule(t + ".bias", "params", path + ("bias",), "copy"),
    ]


def _linear(t: str, path: Tuple[str, ...]) -> List[Rule]:
    return [
        Rule(t + ".weight", "params", path + ("kernel",), "linear"),
        Rule(t + ".bias", "params", path + ("bias",), "copy"),
    ]


def _encoder_layer_rules(t: str, path: Tuple[str, ...]) -> List[Rule]:
    """nn.TransformerEncoderLayer -> layers.TransformerEncoderLayer."""
    return (
        _mha(t + "self_attn.", path + ("MultiHeadDotProductAttention_0",))
        + _ln(t + "norm1", path + ("LayerNorm_0",))
        + _linear(t + "linear1", path + ("Dense_0",))
        + _linear(t + "linear2", path + ("Dense_1",))
        + _ln(t + "norm2", path + ("LayerNorm_1",))
    )


def _decoder_layer_rules(t: str, path: Tuple[str, ...]) -> List[Rule]:
    """nn.TransformerDecoderLayer -> layers.TransformerDecoderLayer."""
    return (
        _mha(t + "self_attn.", path + ("MultiHeadDotProductAttention_0",))
        + _ln(t + "norm1", path + ("LayerNorm_0",))
        + _mha(t + "multihead_attn.", path + ("MultiHeadDotProductAttention_1",))
        + _ln(t + "norm2", path + ("LayerNorm_1",))
        + _linear(t + "linear1", path + ("Dense_0",))
        + _linear(t + "linear2", path + ("Dense_1",))
        + _ln(t + "norm3", path + ("LayerNorm_2",))
    )


def _deeplab_rules(t: str, path: Tuple[str, ...]) -> List[Rule]:
    """DeepLabHead (convolutions.py:274-282): Sequential(ASPP, conv3x3, BN,
    ReLU, conv1x1-with-bias); ASPP = convs[1x1, 3 dilated, pooling] +
    project."""
    a = path + ("ASPP_0",)
    rules = _conv_bn(t + "0.convs.0.0", t + "0.convs.0.1", a + ("ConvBNAct_0",))
    for r in range(3):  # dilated branches
        rules.append(Rule(f"{t}0.convs.{r + 1}.0.weight", "params",
                          a + (f"Conv_{r}", "kernel"), "conv"))
        p = a + (f"BatchNorm_{r}",)
        rules += [
            Rule(f"{t}0.convs.{r + 1}.1.weight", "params", p + ("scale",), "copy"),
            Rule(f"{t}0.convs.{r + 1}.1.bias", "params", p + ("bias",), "copy"),
            Rule(f"{t}0.convs.{r + 1}.1.running_mean", "batch_stats",
                 p + ("mean",), "copy"),
            Rule(f"{t}0.convs.{r + 1}.1.running_var", "batch_stats",
                 p + ("var",), "copy"),
        ]
    rules += _conv_bn(t + "0.convs.4.1", t + "0.convs.4.2", a + ("ASPPPooling_0",))
    rules += _conv_bn(t + "0.project.0", t + "0.project.1", a + ("ConvBNAct_1",))
    rules += _conv_bn(t + "1", t + "2", path + ("ConvBNAct_0",))
    rules += [
        Rule(t + "4.weight", "params", path + ("Conv_0", "kernel"), "conv"),
        Rule(t + "4.bias", "params", path + ("Conv_0", "bias"), "copy"),
    ]
    return rules


def _upsampling_concat_rules(t: str, path: Tuple[str, ...]) -> List[Rule]:
    """UpsamplingConcat (convolutions.py:183-201): two conv-BN-relu blocks."""
    return (_conv_bn(t + "conv.0", t + "conv.1", path + ("ConvBNAct_0",))
            + _conv_bn(t + "conv.3", t + "conv.4", path + ("ConvBNAct_1",)))


def _block_expands(version: str) -> List[int]:
    """Per-global-block expand ratio, in the trunk's block order (matches
    efficientnet_pytorch's _blocks indexing after the stride-16 cut)."""
    _, depth = _MULTIPLIERS[version]
    expands = []
    for expand, _, repeats, _, _ in _B0_STAGES:
        expands += [expand] * _round_repeats(repeats, depth)
    return expands


def _cam_encoder_rules(version: str, use_depth: bool) -> List[Rule]:
    t = "bev_model.cam_encoder."
    f = ("cam_encoder",)
    trunk = f + ("EfficientNetTrunk_0",)
    rules = _conv_bn(t + "backbone._conv_stem", t + "backbone._bn0",
                     trunk + ("ConvBNAct_0",))
    for gi, expand in enumerate(_block_expands(version)):
        b = f"{t}backbone._blocks.{gi}."
        mb = trunk + (f"MBConv_{gi}",)
        k = 0
        if expand != 1:
            rules += _conv_bn(b + "_expand_conv", b + "_bn0",
                              mb + (f"ConvBNAct_{k}",))
            k += 1
        rules += _conv_bn(b + "_depthwise_conv", b + "_bn1",
                          mb + (f"ConvBNAct_{k}",))
        se = mb + ("SqueezeExcite_0",)
        rules += [
            Rule(b + "_se_reduce.weight", "params", se + ("Conv_0", "kernel"), "conv"),
            Rule(b + "_se_reduce.bias", "params", se + ("Conv_0", "bias"), "copy"),
            Rule(b + "_se_expand.weight", "params", se + ("Conv_1", "kernel"), "conv"),
            Rule(b + "_se_expand.bias", "params", se + ("Conv_1", "bias"), "copy"),
        ]
        rules += _conv_bn(b + "_project_conv", b + "_bn2",
                          mb + (f"ConvBNAct_{k + 1}",))
    rules += _deeplab_rules(t + "feature_layer_1.", f + ("feature_head",))
    rules += _upsampling_concat_rules(t + "feature_layer_2.", f + ("feature_up",))
    if use_depth:
        rules += _deeplab_rules(t + "depth_layer_1.", f + ("depth_head",))
        rules += _upsampling_concat_rules(t + "depth_layer_2.", f + ("depth_up",))
    return rules


def _bev_encoder_rules() -> List[Rule]:
    t = "bev_encoder."
    f = ("bev_encoder",)
    rules = _conv_bn(t + "conv1", t + "bn1", f + ("ConvBNAct_0",))
    for idx, (layer, j) in enumerate(
            [(1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)]):
        b = f"{t}layer{layer}.{j}."
        blk = f + (f"BasicBlock_{idx}",)
        rules += _conv_bn(b + "conv1", b + "bn1", blk + ("ConvBNAct_0",))
        rules += _conv_bn(b + "conv2", b + "bn2", blk + ("ConvBNAct_1",))
        if layer > 1 and j == 0:  # strided block: 1x1 downsample shortcut
            rules += _conv_bn(b + "downsample.0", b + "downsample.1",
                              blk + ("ConvBNAct_2",))
    return rules


def _fusion_rules(cfg: ModelConfig) -> List[Rule]:
    t = "feature_fusion."
    f = ("feature_fusion",)
    rules = [Rule(t + "pos_embed", "params", f + ("pos_embed",), "copy")]
    for i, d in enumerate((0, 2, 4)):  # Sequential(Linear, ReLU) x3
        rules += _linear(f"{t}motion_encoder.{d}", f + (f"Dense_{i}",))
    for i in range(cfg.tf_en_layers):
        rules += _encoder_layer_rules(
            f"{t}tf_encoder.layers.{i}.", f + (f"TransformerEncoderLayer_{i}",))
    return rules


def _control_rules(cfg: ModelConfig) -> List[Rule]:
    t = "control_predict."
    f = ("control_decoder",)
    rules = [
        Rule(t + "embedding.weight", "params", f + ("embedding", "embedding"), "copy"),
        Rule(t + "pos_embed", "params", f + ("pos_embed",), "copy"),
    ]
    for i in range(cfg.tf_de_layers):
        rules += _decoder_layer_rules(
            f"{t}tf_decoder.layers.{i}.", f + (f"layer_{i}",))
    rules += _linear(t + "output", f + ("out",))
    return rules


def _seg_head_rules() -> List[Rule]:
    t = "segmentation_head."
    f = ("segmentation_head",)
    rules = []
    for i, name in enumerate(("c5_conv", "up_conv5", "up_conv4", "up_conv3")):
        rules += [
            Rule(f"{t}{name}.weight", "params", f + (f"Conv_{i}", "kernel"), "conv"),
            Rule(f"{t}{name}.bias", "params", f + (f"Conv_{i}", "bias"), "copy"),
        ]
    rules.append(Rule(t + "segmentation_head.0.weight", "params",
                      f + ("Conv_4", "kernel"), "conv"))
    rules += _bn(t + "segmentation_head.1", f)
    rules += [
        Rule(t + "segmentation_head.3.weight", "params",
             f + ("Conv_5", "kernel"), "conv"),
        Rule(t + "segmentation_head.3.bias", "params",
             f + ("Conv_5", "bias"), "copy"),
    ]
    return rules


def build_rules(cfg: ModelConfig) -> List[Rule]:
    version = cfg.backbone.split("-")[1]
    return (
        _cam_encoder_rules(version, cfg.use_depth_distribution)
        + _bev_encoder_rules()
        + _fusion_rules(cfg)
        + _control_rules(cfg)
        + _seg_head_rules()
    )


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------


def _transform(kind: str, aux: int, w: np.ndarray, heads: int) -> np.ndarray:
    if kind == "conv":
        return np.transpose(w, (2, 3, 1, 0))
    if kind == "linear":
        return w.T
    if kind == "copy":
        return w
    if kind == "mha_w":
        E = w.shape[1]
        q = w[aux * E:(aux + 1) * E]  # (E_out, E_in)
        return q.T.reshape(E, heads, E // heads)
    if kind == "mha_b":
        E = w.shape[0] // 3
        return w[aux * E:(aux + 1) * E].reshape(heads, E // heads)
    if kind == "mha_out":
        E = w.shape[0]
        return w.T.reshape(heads, E // heads, E)
    raise ValueError(kind)


def _set(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    if path[-1] in node:
        raise ValueError(f"duplicate assignment at {'/'.join(path)}")
    node[path[-1]] = value


def strip_prefix(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Keep the policy weights: strip the Lightning `parking_model.` prefix
    (agent/parking_agent.py:260-262) and drop anything outside the model
    (e.g. loss-module buffers)."""
    pref = "parking_model."
    if any(k.startswith(pref) for k in state_dict):
        return {k[len(pref):]: v for k, v in state_dict.items()
                if k.startswith(pref)}
    return dict(state_dict)


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       cfg: ModelConfig) -> Tuple[dict, dict]:
    """Map a (prefix-stripped) reference state dict to (params, batch_stats).

    Raises KeyError on any missing torch key; raises ValueError listing any
    non-ignored leftovers, so silent partial imports are impossible.
    """
    sd = strip_prefix(state_dict)
    # encoder/decoder MHA reshapes both use this head count; the rule table
    # does not distinguish them, so refuse configs where they differ rather
    # than silently producing mis-shaped-but-plausible decoder weights
    if cfg.tf_en_heads != cfg.tf_de_heads:
        raise ValueError(
            f"convert_state_dict requires tf_en_heads == tf_de_heads "
            f"(got {cfg.tf_en_heads} vs {cfg.tf_de_heads})")
    heads = cfg.tf_en_heads
    params: dict = {}
    stats: dict = {}
    consumed = set()
    for rule in build_rules(cfg):
        if rule.torch_key not in sd:
            raise KeyError(f"checkpoint is missing `{rule.torch_key}` "
                           f"(wanted for {'/'.join(rule.path)})")
        w = np.asarray(sd[rule.torch_key], dtype=np.float32)
        value = _transform(rule.kind, rule.aux, w, heads)
        _set(params if rule.collection == "params" else stats, rule.path, value)
        consumed.add(rule.torch_key)

    leftovers = [
        k for k in sd
        if k not in consumed
        and not k.endswith(IGNORED_SUFFIXES)
        and not any(k.startswith(p) for p in IGNORED_PREFIXES)
    ]
    if leftovers:
        raise ValueError(f"unmapped checkpoint keys: {sorted(leftovers)[:10]}"
                         f" (+{max(0, len(leftovers) - 10)} more)")
    return params, stats


# ---------------------------------------------------------------------------
# test support: synthesize a reference-shaped state dict from a flax tree
# ---------------------------------------------------------------------------


def _get(tree: dict, path: Tuple[str, ...]):
    for k in path:
        tree = tree[k]
    return tree


def _inverse_shape(kind: str, shape: Tuple[int, ...]) -> Tuple[int, ...]:
    if kind == "conv":
        kh, kw, i, o = shape
        return (o, i, kh, kw)
    if kind == "linear":
        i, o = shape
        return (o, i)
    if kind == "copy":
        return shape
    if kind == "mha_w":
        E = shape[0]
        return (3 * E, E)
    if kind == "mha_b":
        return (3 * shape[0] * shape[1],)
    if kind == "mha_out":
        E = shape[0] * shape[1]
        return (E, E)
    raise ValueError(kind)


def synthesize_state_dict(cfg: ModelConfig, variables: dict,
                          seed: int = 0) -> Dict[str, np.ndarray]:
    """Random torch-side state dict with exactly the shapes the reference
    checkpoint would have (given this config) — for round-trip tests."""
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}
    for rule in build_rules(cfg):
        if rule.torch_key in sd:
            continue
        coll = variables[rule.collection]
        shape = np.shape(_get(coll, rule.path))
        tshape = _inverse_shape(rule.kind, tuple(shape))
        if rule.torch_key.endswith("running_var"):
            sd[rule.torch_key] = rng.uniform(0.5, 1.5, tshape).astype(np.float32)
        else:
            sd[rule.torch_key] = rng.normal(0, 0.05, tshape).astype(np.float32)
    return sd
