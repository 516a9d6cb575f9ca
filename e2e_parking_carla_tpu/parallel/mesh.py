"""Device mesh + sharding rules.

The reference's only multi-device capability is single-host DDP over NCCL
(pl_train.py:47, SURVEY §2.7). The TPU-native equivalent is one jitted
program over a `jax.sharding.Mesh`:

* axis "data": batch-sharded inputs; XLA all-reduces gradients over ICI,
* axis "model": optional tensor parallelism for the transformer blocks
  (attention heads and FFN hidden dim sharded; XLA inserts the activation
  collectives).

Rules are path-regex -> PartitionSpec; anything unmatched is replicated.
This scales past the reference's capability (pure DP) while degenerating to
it at model_axis=1.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# path-regex -> PartitionSpec for tensor-parallel transformer weights.
# flax MultiHeadDotProductAttention kernels: (in, heads, head_dim) for q/k/v,
# (heads, head_dim, out) for the output projection; FFN Dense kernels are
# (in, hidden)/(hidden, out).
TP_RULES: Sequence[tuple] = (
    (r"MultiHeadDotProductAttention_\d+/(query|key|value)/kernel", P(None, MODEL_AXIS, None)),
    (r"MultiHeadDotProductAttention_\d+/(query|key|value)/bias", P(MODEL_AXIS, None)),
    (r"MultiHeadDotProductAttention_\d+/out/kernel", P(MODEL_AXIS, None, None)),
    (r"TransformerEncoderLayer_\d+/Dense_0/kernel", P(None, MODEL_AXIS)),
    (r"TransformerEncoderLayer_\d+/Dense_0/bias", P(MODEL_AXIS)),
    (r"TransformerEncoderLayer_\d+/Dense_1/kernel", P(MODEL_AXIS, None)),
    (r"layer_\d+/Dense_0/kernel", P(None, MODEL_AXIS)),
    (r"layer_\d+/Dense_0/bias", P(MODEL_AXIS)),
    (r"layer_\d+/Dense_1/kernel", P(MODEL_AXIS, None)),
)


def make_mesh(data_axis: int = -1, model_axis: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "model") mesh. data_axis=-1 uses all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_axis < 1:
        model_axis = 1
    if data_axis == -1:
        data_axis = n // model_axis
    assert data_axis * model_axis <= n, (
        f"mesh {data_axis}x{model_axis} needs more than {n} devices")
    grid = np.array(devices[: data_axis * model_axis]).reshape(data_axis, model_axis)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim batch sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch, mesh: Mesh):
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def _spec_for(path: str, use_tp: bool):
    if use_tp:
        for pattern, spec in TP_RULES:
            if re.search(pattern, path):
                return spec
    return P()


def param_sharding(params, mesh: Mesh, fsdp: bool = False,
                   fsdp_min_size: int = 2 ** 16):
    """NamedSharding tree for a param pytree.

    * model axis > 1: tensor-parallel rules for the transformer blocks,
    * fsdp=True: remaining large params are sharded along their largest
      divisible dimension over the "data" axis (ZeRO-3 style — jit inserts
      the all-gathers next to use and reduce-scatters the grads),
    * everything else replicated.
    """
    use_tp = mesh.shape[MODEL_AXIS] > 1
    n_data = mesh.shape[DATA_AXIS]

    def assign(path, leaf):
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        spec = _spec_for(path_str, use_tp)
        if use_tp and spec != P():
            # guard: dims must divide; fall back to replicated otherwise
            for dim, axis in enumerate(spec):
                if axis is not None and leaf.shape[dim] % mesh.shape[MODEL_AXIS]:
                    spec = P()
                    break
        if fsdp and spec == P() and n_data > 1 and leaf.size >= fsdp_min_size:
            # shard the largest divisible dim over "data"
            dims = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
            for d in dims:
                if leaf.shape[d] % n_data == 0:
                    parts = [None] * leaf.ndim
                    parts[d] = DATA_AXIS
                    spec = P(*parts)
                    break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    shardings = param_sharding(params, mesh, fsdp=fsdp)
    return jax.tree.map(jax.device_put, params, shardings)
