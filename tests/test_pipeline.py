"""Pipeline tests: on-device rollout collection, batch rendering, trainer
steps, sharded execution on the virtual 8-device mesh, checkpointing, and a
miniature closed-loop evaluation."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2e_parking_carla_tpu import tokens
from e2e_parking_carla_tpu.config import Config, EvalConfig, ModelConfig, SimConfig, TrainConfig
from e2e_parking_carla_tpu.data.rollout import collect_episodes, make_batch
from e2e_parking_carla_tpu.models import ParkingModel
from e2e_parking_carla_tpu.parallel import make_mesh, param_sharding, shard_batch, shard_params
from e2e_parking_carla_tpu.sim.env import Status
from e2e_parking_carla_tpu.train import checkpoints as ckpt_lib
from e2e_parking_carla_tpu.train import trainer as trainer_lib

TINY_MODEL = dataclasses.replace(
    ModelConfig(),
    backbone="efficientnet-b0",
    image_crop=32,
    final_dim=(32, 32),
    bev_x_bound=(-10.0, 10.0, 0.4),
    bev_y_bound=(-10.0, 10.0, 0.4),
    d_bound=(0.5, 12.5, 2.0),
    bev_encoder_resize=64,
    tf_en_layers=1,
    tf_de_layers=1,
    tf_en_ffn_dim=64,
    tf_de_ffn_dim=64,
    compute_dtype="float32",
)
TINY_SIM = SimConfig(cam_width=32, cam_height=32)
TINY_CFG = Config(model=TINY_MODEL, sim=TINY_SIM,
                  eval=EvalConfig(), train=TrainConfig(batch_size=4, epochs=2))


@pytest.fixture(scope="module")
def buffer():
    return jax.jit(
        lambda k: collect_episodes(k, 4, TINY_MODEL, TINY_SIM, EvalConfig())
    )(jax.random.PRNGKey(0))


def test_collect_episodes(buffer):
    assert buffer.ego_x.shape == (4, 300)
    succ = np.asarray(buffer.success)
    assert succ.all()  # the expert parks every episode
    valid = np.asarray(buffer.valid)
    assert valid.sum() > 0
    # valid frames start at hist_frame_nums and end before terminal - future
    assert not valid[:, : TINY_MODEL.hist_frame_nums].any()
    # every valid frame has a full future-control window inside the episode
    for e in range(4):
        idx = np.where(valid[e])[0]
        assert idx.max() + TINY_MODEL.future_frame_nums < 300


def test_make_batch(buffer):
    batch = jax.jit(
        lambda b, k: make_batch(b, k, 4, TINY_MODEL, TINY_SIM)
    )(buffer, jax.random.PRNGKey(1))
    assert batch["images"].shape == (4, 4, 32, 32, 3)
    assert batch["depth"].shape == (4, 4, 32, 32)
    assert batch["segmentation"].shape == (4, 50, 50)
    assert batch["ego_motion"].shape == (4, 1, 3)
    assert batch["target_point"].shape == (4, 3)
    assert batch["gt_control"].shape == (4, 15)
    gt = np.asarray(batch["gt_control"])
    assert (gt[:, 0] == tokens.BOS).all()
    assert (gt[:, 13] == tokens.EOS).all()
    assert (gt[:, 14] == tokens.PAD).all()
    assert np.isfinite(np.asarray(batch["images"])).all()
    # raw controls consistent with the token sequence
    frames = np.asarray(tokens.split_sequence(gt, 4))
    rev = np.asarray(batch["gt_reverse"])
    np.testing.assert_array_equal(frames[..., 2] > 100, rev.astype(bool))


def test_goal_boost_sampling(buffer):
    """goal_boost upweights the last goal_window valid frames of each
    episode by exactly the configured factor (terminal-precision lever,
    TrainConfig.goal_boost)."""
    from e2e_parking_carla_tpu.data.rollout import sample_frame_indices

    valid = np.asarray(buffer.valid)
    last = valid.shape[1] - 1 - np.argmax(valid[:, ::-1], axis=1)
    window = 20
    n = 20000
    e_u, t_u = jax.jit(
        lambda b, k: sample_frame_indices(b, k, n)
    )(buffer, jax.random.PRNGKey(3))
    e_b, t_b = jax.jit(
        lambda b, k: sample_frame_indices(b, k, n, goal_boost=4.0,
                                          goal_window=window)
    )(buffer, jax.random.PRNGKey(3))
    for e_idx, t_idx in ((e_u, t_u), (e_b, t_b)):
        e_idx, t_idx = np.asarray(e_idx), np.asarray(t_idx)
        assert valid[e_idx, t_idx].all()  # never samples invalid frames
    near_u = (np.asarray(t_u) > last[np.asarray(e_u)] - window).mean()
    near_b = (np.asarray(t_b) > last[np.asarray(e_b)] - window).mean()
    # the boosted near-goal odds must be ~4x the uniform odds
    odds = lambda f: f / (1.0 - f)
    ratio = odds(near_b) / odds(near_u)
    assert 3.0 < ratio < 5.3, (near_u, near_b, ratio)


@pytest.fixture(scope="module")
def model_state(buffer):
    model = ParkingModel(TINY_MODEL, TINY_SIM)
    batch = jax.jit(
        lambda b, k: make_batch(b, k, 4, TINY_MODEL, TINY_SIM)
    )(buffer, jax.random.PRNGKey(2))
    state = trainer_lib.create_train_state(
        model, TINY_CFG, jax.random.PRNGKey(0), batch, steps_per_epoch=10)
    return model, state, batch


def test_train_and_val_step(model_state):
    model, state, batch = model_state
    train_step = trainer_lib.make_train_step(model, TINY_CFG, steps_per_epoch=10,
                                             donate=False)
    new_state, metrics = train_step(state, batch, jax.random.PRNGKey(3))
    assert int(new_state.step) == 1
    for key in ("control_loss", "segmentation_loss", "depth_loss", "train_loss"):
        assert np.isfinite(float(metrics[key])), key
    val_step = trainer_lib.make_val_step(model, TINY_CFG)
    vm = val_step(new_state, batch)
    assert set(vm) == {"acc_steer_val_loss", "reverse_val_loss",
                       "segmentation_val_loss", "depth_val_loss", "val_loss"}
    assert np.isfinite(float(vm["val_loss"]))


def test_mesh_dp_tp(model_state):
    """Full train step over a (4 data x 2 model) mesh on 8 CPU devices."""
    model, state, batch = model_state
    assert len(jax.devices()) == 8
    mesh = make_mesh(data_axis=4, model_axis=2)
    sharded_params = shard_params(state.params, mesh)
    tx = trainer_lib.make_optimizer(TINY_CFG, steps_per_epoch=10)
    sh_state = state.replace(
        params=sharded_params,
        batch_stats=shard_params(state.batch_stats, mesh),
        opt_state=tx.init(sharded_params),  # moments inherit param shardings
    )
    sh_batch = shard_batch(batch, mesh)
    train_step = trainer_lib.make_train_step(model, TINY_CFG, steps_per_epoch=10,
                                             donate=False)
    new_state, metrics = train_step(sh_state, sh_batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["train_loss"]))

    # TP rule actually sharded an attention kernel over the model axis
    specs = param_sharding(state.params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    tp_shards = [s for p, s in flat if "model" in str(s.spec)]
    assert len(tp_shards) > 0


def test_param_sharding_replicated_without_tp(model_state):
    _, state, _ = model_state
    mesh = make_mesh(data_axis=8, model_axis=1)
    specs = param_sharding(state.params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    assert all("model" not in str(s.spec) for _, s in flat)


def test_checkpoint_roundtrip(model_state, tmp_path):
    _, state, _ = model_state
    mngr = ckpt_lib.CheckpointManager(str(tmp_path / "ckpt"), keep_top_k=2,
                                      by="val_loss")
    mngr.save(1, state, metrics={"val_loss": 2.0})
    mngr.save(2, state, metrics={"val_loss": 1.0})
    mngr.save(3, state, metrics={"val_loss": 3.0})
    mngr.wait()
    assert mngr.best_step() == 2
    restored = mngr.restore(state, step=2)
    # latest-k mode retains the most recent checkpoints
    m2 = ckpt_lib.CheckpointManager(str(tmp_path / "ckpt2"), keep_top_k=2)
    for i in (1, 2, 3):
        m2.save(i, state, metrics={"val_loss": float(4 - i)})
    m2.wait()
    assert m2.latest_step() == 3
    m2.close()
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params)
    del chex_equal
    mngr.close()


def test_closed_loop_eval_smoke(model_state, tmp_path):
    """2 slots x 2 attempts, 9 s budget, untrained policy: the protocol
    machinery runs end to end and emits the reference CSV schema."""
    from e2e_parking_carla_tpu.eval import ClosedLoopEvaluator
    from e2e_parking_carla_tpu.eval.csv_io import aggregate_result_csvs

    model, state, _ = model_state
    cfg = dataclasses.replace(
        TINY_CFG,
        eval=EvalConfig(epochs=2, task_nums=2, parking_nums=2,
                        frames_total_needed=270, frames_outbound_needed=60),
    )
    ev = ClosedLoopEvaluator(
        model, {"params": state.params, "batch_stats": state.batch_stats}, cfg)
    overall, per_epoch = ev.run(out_dir=str(tmp_path), epochs=2)
    assert len(per_epoch) == 2
    assert set(overall) >= {"TSR", "TFR", "CR", "TR", "APE", "AOE", "APT", "AIT"}
    assert overall["AIT"] > 0
    # untrained policy: everything terminates somehow (no NaN/hang)
    total = overall["TSR"] + overall["TFR"] + overall["NTSR"] + overall["NTFR"] \
        + overall["CR"] + overall["OR"] + overall["TR"]
    assert 0.0 <= total <= 100.0 + 1e-6
    assert os.path.exists(tmp_path / "1_result.csv")
    assert os.path.exists(tmp_path / "result_mean.csv")
    mean_path, std_path = aggregate_result_csvs(str(tmp_path))
    assert os.path.exists(mean_path) and os.path.exists(std_path)

    # attempt-start settle (reference parking_agent.py:365-368): the ego
    # holds its spawn pose for the first settle_seconds of every attempt
    env0 = ev.make_epoch_envs(0)
    _, traj = ev.run_epoch(0, return_traj=True)
    settle_steps = round(cfg.eval.settle_seconds * cfg.sim.fps
                         / cfg.sim.policy_every)
    assert settle_steps >= 2
    np.testing.assert_allclose(np.asarray(traj["x"][settle_steps - 1]),
                               np.asarray(env0.ego.x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(traj["y"][settle_steps - 1]),
                               np.asarray(env0.ego.y), atol=1e-5)


def test_closed_loop_eval_mirror_ensemble_smoke(model_state, tmp_path):
    """The mirror-ensembled evaluator path (EvalConfig.mirror_ensemble,
    models/parking_model.py:predict_ensemble) jit-compiles inside the
    scanned rollout and completes the mini protocol."""
    from e2e_parking_carla_tpu.eval import ClosedLoopEvaluator

    model, state, _ = model_state
    cfg = dataclasses.replace(
        TINY_CFG,
        eval=EvalConfig(epochs=1, task_nums=1, parking_nums=2,
                        frames_total_needed=150, frames_outbound_needed=60,
                        mirror_ensemble=True),
    )
    ev = ClosedLoopEvaluator(
        model, {"params": state.params, "batch_stats": state.batch_stats}, cfg)
    overall, per_epoch = ev.run(out_dir=str(tmp_path), epochs=1)
    assert len(per_epoch) == 1
    total = overall["TSR"] + overall["TFR"] + overall["NTSR"] + overall["NTFR"] \
        + overall["CR"] + overall["OR"] + overall["TR"]
    assert 0.0 <= total <= 100.0 + 1e-6
    assert overall["AIT"] > 0


def test_closed_loop_probe_and_soup(model_state, tmp_path):
    """Multi-seed probe selection + top-K weight-soup export (round-3
    variance treatment, train/probe.py): two probe calls on different weight
    sets must track the best score, export a loadable best artifact, and the
    soup must be the parameter mean of the stored snapshots."""
    from e2e_parking_carla_tpu.train.probe import ClosedLoopProbe

    model, state, _ = model_state
    cfg = dataclasses.replace(
        TINY_CFG,
        eval=EvalConfig(task_nums=2, frames_total_needed=150,
                        frames_outbound_needed=60),
    )
    probe = ClosedLoopProbe(model, cfg, parking_nums=1, seeds=2, top_k=2)
    best_path = str(tmp_path / "best.msgpack.gz")
    v1 = {"params": state.params, "batch_stats": state.batch_stats}
    m1 = probe(v1, step=100, export_path=best_path)
    assert {"TSR", "CR", "TR", "probe_score"} <= set(m1)
    assert probe.best_step == 100
    assert os.path.exists(best_path)

    # second probe with perturbed weights: snapshot list grows, soup = mean
    v2 = {"params": jax.tree.map(lambda p: p + 0.05, state.params),
          "batch_stats": state.batch_stats}
    probe(v2, step=200, export_path=best_path)
    assert len(probe._top) == 2
    soup = probe.soup_variables()
    leaf1 = jax.tree.leaves(v1["params"])[0]
    leaf2 = jax.tree.leaves(v2["params"])[0]
    leaf_s = jax.tree.leaves(soup["params"])[0]
    np.testing.assert_allclose(np.asarray(leaf_s),
                               (np.asarray(leaf1) + np.asarray(leaf2)) / 2,
                               rtol=1e-6)

    soup_path = str(tmp_path / "soup.msgpack.gz")
    out = probe.export_soup(soup_path)
    assert out is not None and os.path.exists(soup_path)
    restored = ckpt_lib.load_weights_artifact(
        soup_path, {"params": state.params, "batch_stats": state.batch_stats})
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored["params"])[0]),
        np.asarray(leaf_s), rtol=1e-6)

    # seed-count override (the late-schedule boost passes seeds=2*base):
    # the evaluator is seed-deterministic, so re-proving v1 over the same
    # seed range must reproduce its metrics exactly
    m1b = probe(v1, step=300, seeds=2)
    assert m1b["TSR"] == m1["TSR"] and m1b["CR"] == m1["CR"]


def test_live_eval_view(model_state, tmp_path):
    """Step-by-step live eval viewer (eval/live.py, the reference's
    --show_eva_imgs panel): headless GIF fallback must roll an attempt and
    write frames."""
    from e2e_parking_carla_tpu.eval.live import run_live_eval

    model, state, _ = model_state
    cfg = dataclasses.replace(
        TINY_CFG, eval=EvalConfig(frames_total_needed=150,
                                  frames_outbound_needed=60))
    gif = str(tmp_path / "live.gif")
    status = run_live_eval(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        cfg, target_idx=17, out_gif=gif, max_steps=4)
    assert os.path.exists(gif)
    assert isinstance(status, int)


def test_mesh_fsdp(model_state):
    """Full train step with ZeRO-3-style param sharding over 4 devices."""
    model, state, batch = model_state
    mesh = make_mesh(data_axis=4, model_axis=1)
    sharded_params = shard_params(state.params, mesh, fsdp=True)
    tx = trainer_lib.make_optimizer(TINY_CFG, steps_per_epoch=10)
    sh_state = state.replace(
        params=sharded_params,
        batch_stats=shard_params(state.batch_stats, mesh),
        opt_state=tx.init(sharded_params),
    )
    sh_batch = shard_batch(batch, mesh)
    train_step = trainer_lib.make_train_step(model, TINY_CFG, steps_per_epoch=10,
                                             donate=False)
    _, metrics = train_step(sh_state, sh_batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["train_loss"]))

    # at least one large kernel actually sharded over "data"
    specs = param_sharding(state.params, mesh, fsdp=True)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    assert any("data" in str(s.spec) for _, s in flat)


def test_dart_noise_off_is_bit_exact(buffer):
    """sigma=0 must reproduce the pre-DART collection exactly (same RNG
    consumption for goals/poses/scenes/weather)."""
    buf2 = jax.jit(
        lambda k: collect_episodes(k, 4, TINY_MODEL, TINY_SIM, EvalConfig(),
                                   dart_steer_sigma=0.0, dart_accel_sigma=0.0)
    )(jax.random.PRNGKey(0))
    for f in ("ego_x", "ego_y", "ego_yaw", "steer", "throttle", "valid"):
        np.testing.assert_array_equal(np.asarray(getattr(buffer, f)),
                                      np.asarray(getattr(buf2, f)))


def test_dart_labels_are_clean_expert_actions():
    """DART contract: the EXECUTED control is perturbed (trajectories
    deviate from the clean rollout) but the RECORDED label at each visited
    state is the expert's clean action recomputed at that state."""
    from e2e_parking_carla_tpu.sim.env import EgoState, SceneState, reset_env
    from e2e_parking_carla_tpu.sim.expert import ExpertState, expert_policy

    k = jax.random.PRNGKey(5)
    clean = jax.jit(lambda kk: collect_episodes(
        kk, 4, TINY_MODEL, TINY_SIM, EvalConfig()))(k)
    noisy = jax.jit(lambda kk: collect_episodes(
        kk, 4, TINY_MODEL, TINY_SIM, EvalConfig(),
        dart_steer_sigma=0.4, dart_accel_sigma=0.25))(k)
    # same scenes/goals (identical RNG for scene sampling)...
    np.testing.assert_array_equal(np.asarray(clean.target_idx),
                                  np.asarray(noisy.target_idx))
    # ...but the executed paths deviate
    assert np.abs(np.asarray(clean.ego_x) - np.asarray(noisy.ego_x)).max() > 0.05
    # label check: replay expert_policy through the noisy buffer's states.
    # The expert is a *stateful* phase machine, so replay it sequentially at
    # the same 10 Hz cadence over the stored states of one episode and
    # compare the stored labels where the phase machines agree; steer labels
    # must match the clean recomputation exactly at every visited state.
    e = 0
    est = ExpertState.init(())
    sc = SceneState(npc_valid=noisy.npc_valid[e], npc_yaw=noisy.npc_yaw[e],
                    goal_free=~noisy.npc_valid[e], target_idx=noisy.target_idx[e])
    n_match = 0
    for t in range(0, 40):
        ego = EgoState(
            x=noisy.ego_x[e, t], y=noisy.ego_y[e, t], yaw=noisy.ego_yaw[e, t],
            v=jnp.float32(0.0), acc_x=noisy.acc_x[e, t], acc_y=noisy.acc_y[e, t])
        ctrl, est = expert_policy(ego, sc, est, TINY_SIM)
        # steer depends only on pose+phase (not v), so it must match exactly
        if int(est.phase) == 0:  # phase machines comparable pre-arc
            np.testing.assert_allclose(float(ctrl.steer),
                                       float(noisy.steer[e, t]), atol=1e-4)
            n_match += 1
    assert n_match > 3


def test_train_loop_late_dagger_boost(tmp_path):
    """The late-schedule DAgger boost swaps to a larger jitted collector
    past dagger_late_frac: run a tiny loop across the transition and check
    it trains through both phases (buffer env-count grows, loss finite)."""
    from e2e_parking_carla_tpu.train.loop import train_loop

    cfg = dataclasses.replace(
        TINY_CFG,
        train=dataclasses.replace(
            TINY_CFG.train, batch_size=4, dagger_envs_frac=0.5,
            dagger_expert_mix=1.0, dagger_start_step=2,
            dagger_late_boost=2.0, dagger_late_frac=0.5,
            checkpoint_dir=str(tmp_path)),
    )
    model = ParkingModel(cfg.model, cfg.sim)
    state = train_loop(model, cfg, total_steps=16, n_envs=4,
                       refresh_every=4, val_every=8, chunk=2, seed=0,
                       log_fn=None)
    assert int(state.step) == 16


def test_closed_loop_eval_sharded_over_data_axis(model_state, tmp_path):
    """VERDICT-3 item 5: the protocol sharded over the mesh's data axis.
    An 8-device data mesh must (a) run the mini protocol end to end via
    shard_map and (b) reproduce the unsharded evaluator's terminal states —
    the per-device body is the identical program, so outcomes must agree."""
    from e2e_parking_carla_tpu.eval import ClosedLoopEvaluator

    model, state, _ = model_state
    cfg = dataclasses.replace(
        TINY_CFG,
        eval=EvalConfig(epochs=1, task_nums=2, parking_nums=2,
                        frames_total_needed=270, frames_outbound_needed=60),
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh = make_mesh(data_axis=8, model_axis=1)
    ev_sharded = ClosedLoopEvaluator(model, variables, cfg, mesh=mesh)
    ev_plain = ClosedLoopEvaluator(model, variables, cfg)

    fin_s = ev_sharded.run_epoch(0)
    fin_p = ev_plain.run_epoch(0)
    np.testing.assert_array_equal(np.asarray(fin_s.status),
                                  np.asarray(fin_p.status))
    for field in ("x", "y", "yaw"):
        np.testing.assert_allclose(np.asarray(getattr(fin_s.ego, field)),
                                   np.asarray(getattr(fin_p.ego, field)),
                                   atol=1e-5)
