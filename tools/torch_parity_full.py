"""Full-size torch->flax import parity on the real chip (VERDICT-3 item 8).

tests/test_torch_e2e.py proves whole-model logits parity at reduced shapes
on CPU; this runs the SAME synthesized-checkpoint round trip at the
reference's released configuration — efficientnet-b4 trunk, 256x256 crop,
200^2 BEV grid (/root/reference/config/training.yaml) — with the flax side
jitted on the attached TPU, and records max |delta| per output head. One
recorded number makes the import path trustworthy end-to-end for anyone
holding the real released .ckpt (reference README.md:36).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/torch_parity_full.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    import dataclasses

    from e2e_parking_carla_tpu import tokens
    from e2e_parking_carla_tpu.config import ModelConfig, SimConfig
    from e2e_parking_carla_tpu.data.torch_import import convert_state_dict
    from e2e_parking_carla_tpu.models.parking_model import ParkingModel
    from tests.test_torch_e2e import TorchParkingModel, _randomize

    cfg = dataclasses.replace(ModelConfig(), torch_parity=True,
                              compute_dtype="float32")
    sim = SimConfig()
    assert cfg.backbone == "efficientnet-b4" and cfg.image_crop == 256, (
        "default ModelConfig is expected to BE the reference parity config")

    print(f"building torch reference model ({cfg.backbone}, "
          f"{cfg.image_crop}^2)...", flush=True)
    tm = TorchParkingModel(cfg, sim)
    _randomize(tm)
    tm.eval()

    rng = np.random.RandomState(0)
    B, H = 1, cfg.image_crop
    images = rng.normal(0, 1, (B, 4, H, H, 3)).astype(np.float32)
    ego_motion = rng.normal(0, 1, (B, 1, 3)).astype(np.float32)
    target_point = np.array([[5.0, -2.0, 90.0]], np.float32)
    # numpy (NOT jnp) so the jax backend — and with it the TPU hold — only
    # initializes AFTER the minutes-long torch CPU forward: on this
    # one-core box a process that holds the tunnel while pegging the CPU
    # can wedge the TPU session (STATUS.md "tunnel incidents")
    flat = rng.randint(0, 200, (B, 12)).astype(np.int32)
    n_pad = cfg.tf_de_tgt_dim - 14
    gt = np.concatenate(
        [np.full((B, 1), tokens.BOS, np.int32), flat,
         np.full((B, 1), tokens.EOS, np.int32),
         np.full((B, n_pad), tokens.PAD, np.int32)], axis=1)

    print("torch forward (cpu)...", flush=True)
    with torch.no_grad():
        t_logits, t_seg, t_depth = tm(
            torch.from_numpy(images).permute(0, 1, 4, 2, 3),
            torch.from_numpy(ego_motion),
            torch.from_numpy(target_point),
            torch.from_numpy(gt))

    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if k != "voxel_rank"}
    params, stats = convert_state_dict(sd, cfg)

    print(f"flax forward on {jax.devices()[0].platform}...", flush=True)
    fm = ParkingModel(cfg, sim)
    f_logits, f_seg, f_depth = jax.jit(
        lambda p, s, *a: fm.apply({"params": p, "batch_stats": s}, *a,
                                  train=False))(
        params, stats, jnp.asarray(images), jnp.asarray(ego_motion),
        jnp.asarray(target_point), jnp.asarray(gt))

    d_depth = float(np.abs(np.moveaxis(np.asarray(f_depth), -1, 2)
                           - t_depth.numpy()).max())
    d_seg = float(np.abs(np.moveaxis(np.asarray(f_seg), -1, 1)
                         - t_seg.numpy()).max())
    d_ctl = float(np.abs(np.asarray(f_logits) - t_logits.numpy()).max())
    print(f"max|d depth_logits| = {d_depth:.3e}")
    print(f"max|d seg_logits|   = {d_seg:.3e}")
    print(f"max|d ctl_logits|   = {d_ctl:.3e}")
    ok = d_depth < 1e-2 and d_seg < 5e-2 and d_ctl < 5e-2
    print("PARITY " + ("OK" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
