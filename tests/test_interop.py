"""Disk-format interop: export an on-device episode to the reference's
layout, read it back with the torch-free dataset reader, and check the
training tensors agree with the on-device pipeline."""

import dataclasses
import os

import numpy as np
import jax
import pytest

from e2e_parking_carla_tpu.config import Config, EvalConfig, ModelConfig, SimConfig, TrainConfig
from e2e_parking_carla_tpu.data.dataset import CarlaEpisodeDataset
from e2e_parking_carla_tpu.data.export import export_episodes
from e2e_parking_carla_tpu.data.rollout import collect_episodes

TINY_MODEL = dataclasses.replace(
    ModelConfig(),
    backbone="efficientnet-b0",
    image_crop=64,
    final_dim=(64, 64),
    compute_dtype="float32",
)
TINY_SIM = SimConfig(cam_width=64, cam_height=64)
CFG = Config(model=TINY_MODEL, sim=TINY_SIM, eval=EvalConfig(), train=TrainConfig())


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    root = tmp_path_factory.mktemp("episodes")
    buf = jax.jit(lambda k: collect_episodes(k, 2, CFG.model, CFG.sim, CFG.eval))(
        jax.random.PRNGKey(0))
    out = export_episodes(buf, str(root), "Town04_Opt", CFG, render=True)
    return buf, out


def test_export_layout(exported):
    _, out = exported
    task0 = os.path.join(out, "task0")
    for d in ("rgb_front", "rgb_left", "rgb_right", "rgb_rear",
              "depth_front", "depth_rear", "measurements", "parking_goal",
              "topdown"):
        assert os.path.isdir(os.path.join(task0, d)), d
    assert os.path.exists(os.path.join(task0, "parking_goal", "0001.json"))
    n_meas = len(os.listdir(os.path.join(task0, "measurements")))
    n_rgb = len(os.listdir(os.path.join(task0, "rgb_front")))
    assert n_meas == n_rgb > 20


def test_reader_round_trip(exported):
    buf, out = exported
    ds = CarlaEpisodeDataset(os.path.dirname(out), cfg=CFG.model)
    assert len(ds) > 0
    item = ds[0]

    assert item["images"].shape == (4, 64, 64, 3)
    assert item["depth"].shape == (4, 64, 64)
    assert item["segmentation"].shape == (200, 200)
    assert item["gt_control"].shape == (15,)
    assert item["gt_control"][0] == CFG.model.bos_token
    assert item["gt_control"][-2] == CFG.model.eos_token
    assert np.isfinite(item["images"]).all()

    # frame hist_frame_nums of episode 0: compare against the buffer's state
    t = CFG.model.hist_frame_nums
    m_speed = item["ego_motion"][0, 0]
    np.testing.assert_allclose(m_speed, float(buf.speed[0, t]), rtol=1e-5)
    # depth decode round-trips through the CARLA PNG encoding
    assert 0.0 <= item["depth"].min() and item["depth"].max() <= 1000.5

    # token sequence equals tokenizing the buffer's future controls
    from e2e_parking_carla_tpu import tokens as tok

    fut = np.asarray(tok.tokenize(
        buf.throttle[0, t + 1:t + 5], buf.brake[0, t + 1:t + 5],
        buf.steer[0, t + 1:t + 5], buf.reverse[0, t + 1:t + 5].astype(np.float32)))
    np.testing.assert_array_equal(
        item["gt_control"][1:13], fut.reshape(-1))


def test_reader_batches(exported):
    _, out = exported
    ds = CarlaEpisodeDataset(os.path.dirname(out), cfg=CFG.model)
    batch = next(ds.batches(batch_size=2, seed=0))
    assert batch["images"].shape == (2, 4, 64, 64, 3)
    assert batch["gt_control"].shape == (2, 15)
