"""Tests for the auxiliary subsystems: viz, logging, profiling."""

import json
import os

import numpy as np

from e2e_parking_carla_tpu.utils.logging import MetricLogger
from e2e_parking_carla_tpu.utils.profiling import SimpleProfiler
from e2e_parking_carla_tpu.utils.viz import (
    attention_panel,
    bev_panel,
    camera_grid,
    compose_frame,
    save_gif,
)


def test_camera_grid_layout():
    rgb = np.zeros((4, 8, 8, 3), np.float32)
    rgb[0, :, :, 0] = 1.0  # front = red, top-left
    rgb[2, :, :, 2] = 1.0  # right = blue, bottom-right
    grid = camera_grid(rgb)
    assert grid.shape == (16, 16, 3)
    assert grid[0, 0, 0] == 255  # front top-left
    assert grid[15, 15, 2] == 255  # right bottom-right


def test_bev_panel_colors_and_flip():
    seg = np.zeros((10, 10), np.int32)
    seg[9, 0] = 2  # far-forward cell -> should appear at the TOP after flip
    img = bev_panel(seg, upscale=1)
    assert img.shape == (10, 10, 3)
    assert tuple(img[0, 0]) == (220, 60, 60)


def test_attention_panel():
    attn = np.random.RandomState(0).rand(6, 16, 16).astype(np.float32)
    img = attention_panel(attn, out_size=32)
    assert img.shape == (32, 32, 3)
    assert img.dtype == np.uint8


def test_compose_and_gif(tmp_path):
    rgb = np.random.RandomState(1).rand(4, 16, 16, 3).astype(np.float32)
    seg = np.zeros((8, 8), np.int32)
    frame = compose_frame(rgb, seg)
    assert frame.shape[0] == 32  # grid height
    path = save_gif([frame, frame], str(tmp_path / "a.gif"), fps=5)
    assert os.path.getsize(path) > 100


def test_metric_logger(tmp_path):
    logger = MetricLogger(str(tmp_path), echo=False, tensorboard=False)
    logger.log(1, {"loss": 2.5})
    logger.log(2, {"loss": 1.5}, prefix="val/")
    logger.message("hello")
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 2.5
    assert lines[1]["val/loss"] == 1.5
    assert lines[2]["msg"] == "hello"


def test_simple_profiler():
    prof = SimpleProfiler()
    with prof.section("a"):
        x = sum(range(1000))
    with prof.section("a"):
        pass
    with prof.section("b"):
        pass
    out = prof.summary()
    assert "a" in out and "b" in out
    assert prof._count["a"] == 2
    del x


def test_per_slot_metrics_csv():
    import dataclasses
    import jax
    import jax.numpy as jnp

    from e2e_parking_carla_tpu.config import EvalConfig
    from e2e_parking_carla_tpu.eval.csv_io import per_slot_metrics
    from e2e_parking_carla_tpu.sim.env import Status

    cfg = EvalConfig(task_nums=2, parking_nums=2)

    class F:  # minimal stand-in for terminal EnvStates
        status = np.array([1, 1, 5, 7], np.int32)
        final_pos_err = np.array([0.2, 0.4, 0.0, 0.0], np.float32)
        final_orient_err = np.array([1.0, 3.0, 0.0, 0.0], np.float32)
        final_time = np.array([10.0, 20.0, 0.0, 0.0], np.float32)

    rows = per_slot_metrics(F, cfg, ait=0.05)
    assert rows[0]["slot_id"] == "2-1" and rows[1]["slot_id"] == "2-3"
    assert rows[0]["TSR"] == 100.0 and rows[0]["APE"] == np.float32(0.3)
    assert rows[1]["CR"] == 50.0 and rows[1]["TR"] == 50.0
    assert np.isnan(rows[1]["APE"])  # no successes in slot 2
    assert rows[0]["AIT"] == 50.0


def test_merge_weights_artifact(tmp_path):
    """Warm-start transfer (cli/train.py --init_from): leaves transfer only
    on path+shape match and outside the skip prefixes — the rest keep their
    fresh init. Our analog of the reference's ImageNet-pretrained trunk
    fine-tune (model/cam_encoder.py:17)."""
    import jax.numpy as jnp

    from e2e_parking_carla_tpu.train import checkpoints as ckpt_lib

    donor = {
        "params": {
            "cam_encoder": {"w": jnp.full((4, 4), 2.0)},
            "decoder": {"w": jnp.full((3,), 5.0)},
            "fusion": {"w": jnp.full((2, 2), 7.0)},  # shape-mismatched below
        },
        "batch_stats": {"bn": {"mean": jnp.full((4,), 9.0)}},
    }
    path = str(tmp_path / "donor.msgpack.gz")
    ckpt_lib.save_weights_artifact(path, donor["params"], donor["batch_stats"])

    skeleton = {
        "params": {
            "cam_encoder": {"w": jnp.zeros((4, 4))},   # skipped by prefix
            "decoder": {"w": jnp.zeros((3,))},          # transfers
            "fusion": {"w": jnp.zeros((2, 3))},         # shape mismatch
            "new_head": {"w": jnp.zeros((5,))},         # absent in donor
        },
        "batch_stats": {"bn": {"mean": jnp.zeros((4,))}},  # transfers
    }
    merged, n_copied, n_skipped = ckpt_lib.merge_weights_artifact(
        path, skeleton, skip_prefixes=("cam_encoder",))

    assert n_copied == 2 and n_skipped == 3
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["decoder"]["w"]), 5.0 * np.ones(3))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["cam_encoder"]["w"]), np.zeros((4, 4)))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["fusion"]["w"]), np.zeros((2, 3)))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["new_head"]["w"]), np.zeros(5))
    np.testing.assert_array_equal(
        np.asarray(merged["batch_stats"]["bn"]["mean"]), 9.0 * np.ones(4))
