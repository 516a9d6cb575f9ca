"""Train-CLI lever flags must reach TrainConfig (every quality lever is
driven per run from the chip queue scripts, so a silently dropped flag
changes the recipe without anyone noticing)."""

from e2e_parking_carla_tpu.cli.train import apply_train_overrides, parse_args
from e2e_parking_carla_tpu.config import Config


def test_flags_reach_train_config():
    args = parse_args([
        "--dagger_frac", "0.3", "--dagger_mix", "0.6",
        "--dagger_start", "7000", "--near_frac", "0.5",
        "--dagger_timeout_keep", "4", "--dagger_late_boost", "2.0",
        "--dagger_late_frac", "0.9", "--ema_decay", "0.995",
        "--dart_steer", "0.05", "--dart_accel", "0.02",
    ])
    t = apply_train_overrides(Config(), args).train
    assert t.dagger_envs_frac == 0.3
    assert t.dagger_expert_mix == 0.6
    assert t.dagger_start_step == 7000
    assert t.start_near_frac == 0.5
    assert t.dagger_timeout_keep_every == 4
    assert t.dagger_late_boost == 2.0
    assert t.dagger_late_frac == 0.9
    assert t.ema_decay == 0.995
    assert t.dart_steer_sigma == 0.05
    assert t.dart_accel_sigma == 0.02


def test_no_flags_is_identity():
    cfg = Config()
    assert apply_train_overrides(cfg, parse_args([])) is cfg


def test_eval_mirror_ensemble_flag_reaches_config():
    from e2e_parking_carla_tpu.cli import evaluate as eval_cli

    args = eval_cli.parse_args(["--expert", "--mirror_ensemble"])
    assert args.mirror_ensemble
    assert not eval_cli.parse_args(["--expert"]).mirror_ensemble
