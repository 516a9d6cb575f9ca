"""Import a reference torch checkpoint into a portable flax weights artifact.

    python -m e2e_parking_carla_tpu.cli.import_ckpt \
        --ckpt E2EParking-epoch.ckpt --out ref_weights.msgpack.gz

The input is the reference's Lightning checkpoint (keys under the
`parking_model.` prefix, agent/parking_agent.py:257-270); the output is the
same .msgpack.gz artifact format `cli.evaluate --weights` consumes, so the
released reference policy can be scored on the TPU protocol directly.
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="torch .ckpt/.pth path")
    p.add_argument("--out", required=True, help="output .msgpack.gz artifact")
    p.add_argument("--config", default=None,
                   help="YAML config matching the checkpoint's architecture "
                        "(default: the b4 parity config)")
    p.add_argument("--no_verify", action="store_true",
                   help="skip the flax-skeleton shape check (faster)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    # conversion is host-side work; never claim the (possibly busy) TPU
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    from e2e_parking_carla_tpu.config import Config, load_config
    from e2e_parking_carla_tpu.data.torch_import import convert_state_dict
    from e2e_parking_carla_tpu.train import checkpoints as ckpt_lib

    cfg = load_config(args.config) if args.config else Config()
    raw = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    params, batch_stats = convert_state_dict(sd, cfg.model)

    if not args.no_verify:
        import chex

        from e2e_parking_carla_tpu.models import ParkingModel
        import jax.numpy as jnp

        model = ParkingModel(cfg.model, cfg.sim)
        H = cfg.model.image_crop
        skel = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, H, H, 3)), jnp.zeros((1, 1, 3)),
            jnp.zeros((1, 2)), jnp.zeros((1, 14), jnp.int32), train=False))()
        chex.assert_trees_all_equal_shapes(skel["params"], params)
        chex.assert_trees_all_equal_shapes(skel.get("batch_stats", {}), batch_stats)
        print("shape check vs flax skeleton: OK")

    ckpt_lib.save_weights_artifact(args.out, params, batch_stats, step=0)
    n = sum(np.size(x) for x in jax_tree_leaves(params))
    print(f"wrote {args.out} ({n / 1e6:.1f}M params)")
    if not getattr(cfg.model, "torch_parity", False):
        print("note: evaluate imported weights with `torch_parity: 1` in the "
              "model config — it selects torch-exact padding/eps semantics "
              "(whole-model logits parity: tests/test_torch_e2e.py)")
    return 0


def jax_tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    raise SystemExit(main())
