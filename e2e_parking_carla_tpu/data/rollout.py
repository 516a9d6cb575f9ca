"""On-device expert data generation: rollouts -> training batches.

Replaces the reference's entire disk pipeline — human demos recorded as PNG/
JSON episodes by 10 writer threads (data_generation/data_generator.py:
186-292), eagerly re-indexed and PIL-decoded by 8 dataloader workers
(dataset/carla_dataset.py:272-374, dataset/dataloader.py:18-49) — with a
state buffer + on-the-fly rendering:

* `collect_episodes` runs a vmapped fleet of expert episodes and stores only
  the 10 Hz *state* snapshots (pose, motion, applied controls, scene) — a
  few hundred bytes per frame instead of nine PNGs,
* `make_batch` samples (episode, frame) pairs and *renders the pixels on
  device at batch-assembly time* (camera + BEV rasterizers are pure
  functions of state), producing exactly the 11-tensor training dict the
  reference dataset emits (carla_dataset.py:379-423): images, depth,
  segmentation, ego_motion, target_point, token sequence, raw gt controls.

Token timing matches the reference: the supervision sequence for frame i is
the controls applied at 10 Hz frames i+1..i+4 (carla_dataset.py:322-341),
and frames earlier than hist_frame_nums or too close to episode end are
excluded (carla_dataset.py:291).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from e2e_parking_carla_tpu import mirror as mirror_lib
from e2e_parking_carla_tpu import tokens as tok
from e2e_parking_carla_tpu.config import EvalConfig, ModelConfig, SimConfig
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.bev import render_bev_seg, target_in_ego_frame
from e2e_parking_carla_tpu.ops.dispatch import render_batch
from e2e_parking_carla_tpu.sim.env import SceneState, Status, reset_env, step_env
from e2e_parking_carla_tpu.sim.expert import ExpertState, expert_policy

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


@struct.dataclass
class EpisodeBuffer:
    """10 Hz state snapshots for a fleet of episodes. E envs x T frames."""

    ego_x: jnp.ndarray  # (E, T)
    ego_y: jnp.ndarray
    ego_yaw: jnp.ndarray
    speed: jnp.ndarray  # |v| in km/h (reference units)
    acc_x: jnp.ndarray
    acc_y: jnp.ndarray
    throttle: jnp.ndarray  # control applied at this frame
    brake: jnp.ndarray
    steer: jnp.ndarray
    reverse: jnp.ndarray  # bool
    npc_valid: jnp.ndarray  # (E, S)
    npc_yaw: jnp.ndarray  # (E, S)
    target_idx: jnp.ndarray  # (E,)
    weather: jnp.ndarray  # (E,)
    valid: jnp.ndarray  # (E, T) — usable as a training index
    success: jnp.ndarray  # (E,)

    @property
    def num_frames(self):
        return self.valid.shape[1]


def collect_episodes(key: jax.Array, n_envs: int, model_cfg: ModelConfig,
                     sim_cfg: SimConfig, eval_cfg: EvalConfig,
                     max_frames: int = 900,
                     dart_steer_sigma: float = 0.0,
                     dart_accel_sigma: float = 0.0,
                     dart_tau: float = 0.5,
                     dart_trim_scale: float = 0.3,
                     start_near_frac: float = 0.0) -> EpisodeBuffer:
    """Run `n_envs` expert episodes (random goal slot + start pose + scene,
    mirroring the data-gen protocol) and snapshot every `policy_every`-th
    frame. Fully jittable; the whole fleet is one lax.scan.

    With `dart_*_sigma > 0` the rollout is DART-style (noise-injected
    expert, config.py TrainConfig docs): OU-correlated noise perturbs the
    EXECUTED steer/accel while the snapshot records the expert's CLEAN
    action as the label at every visited state. Per-env noise amplitude is
    drawn uniform in [0, 1]x sigma, so each refresh spans clean
    demonstrations through strongly perturbed ones; episodes the noise
    pushes into collision/timeout fail the success gate and are excluded by
    `valid` as usual."""
    k_goal, k_pose, k_scene, k_weather, k_amp, k_noise = jax.random.split(key, 6)
    goal_choices = jnp.asarray(scene_lib.DATAGEN_GOAL_INDICES)
    targets = goal_choices[jax.random.randint(k_goal, (n_envs,), 0, len(goal_choices))]
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(
        lambda k, gy: scene_lib.datagen_start_pose(
            k, gy, near_frac=start_near_frac))(
        jax.random.split(k_pose, n_envs), goal_y)
    states = jax.vmap(reset_env)(
        jax.random.split(k_scene, n_envs), targets, xs, ys, yaws)
    weather = jax.random.randint(k_weather, (n_envs,), 0, 14)
    est = ExpertState.init((n_envs,))

    use_dart = dart_steer_sigma > 0.0 or dart_accel_sigma > 0.0
    # per-env amplitude scale in [0, 1]: half the value-mass near clean
    # demonstrations, the rest increasingly perturbed
    amp = jax.random.uniform(k_amp, (n_envs,))
    # OU discretization at the sim rate
    rho = jnp.exp(-1.0 / (sim_cfg.fps * dart_tau))
    ou_scale = jnp.sqrt(1.0 - rho * rho)

    def body(carry, k_t):
        s, e, n_ou = carry
        ctrl, e = jax.vmap(lambda a, b, c: expert_policy(a, b, c, sim_cfg))(
            s.ego, s.scene, e)
        if use_dart:
            eps = jax.random.normal(k_t, (n_envs, 2))
            n_ou = rho * n_ou + ou_scale * eps
            # precision phases (TRIM=3 / HOLD=4) get attenuated noise
            atten = jnp.where(e.phase >= 3, dart_trim_scale, 1.0)
            n_steer = n_ou[:, 0] * dart_steer_sigma * amp * atten
            n_acc = n_ou[:, 1] * dart_accel_sigma * amp * atten
            acc = jnp.clip(ctrl.throttle - ctrl.brake + n_acc, -1.0, 1.0)
            exec_ctrl = ctrl.replace(
                steer=jnp.clip(ctrl.steer + n_steer, -1.0, 1.0),
                throttle=jnp.maximum(acc, 0.0),
                brake=jnp.maximum(-acc, 0.0),
            )
        else:
            exec_ctrl = ctrl
        s_next = jax.vmap(lambda st, c: step_env(st, c, sim_cfg, eval_cfg))(
            s, exec_ctrl)
        snap = {
            "x": s.ego.x, "y": s.ego.y, "yaw": s.ego.yaw,
            # km/h magnitude — the reference records 3.6*|v| into
            # measurements (data_generator.py:260) and feeds the same units
            # at eval (parking_agent.py:477)
            "speed": 3.6 * jnp.abs(s.ego.v), "acc_x": s.ego.acc_x, "acc_y": s.ego.acc_y,
            "throttle": ctrl.throttle, "brake": ctrl.brake, "steer": ctrl.steer,
            "reverse": ctrl.reverse, "status": s_next.status,
        }
        return (s_next, e, n_ou), snap

    step_keys = jax.random.split(k_noise, max_frames)
    (final, _, _), traj = jax.lax.scan(
        body, (states, est, jnp.zeros((n_envs, 2))), step_keys)
    # subsample to the 10 Hz policy/save rate (reference data_generator.py:35)
    k = sim_cfg.policy_every
    traj10 = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1)[:, ::k], traj)  # (E, T)
    T = traj10["x"].shape[1]

    success = final.status == Status.TARGET_SUCCESS
    # first 10 Hz index whose *status* is already terminal (success reached)
    done10 = traj10["status"] != Status.RUNNING
    first_done = jnp.argmax(done10, axis=1)  # 0 if never done
    end = jnp.where(done10.any(axis=1), first_done, T)
    t_idx = jnp.arange(T)[None, :]
    hist = model_cfg.hist_frame_nums
    fut = model_cfg.future_frame_nums
    valid = (
        success[:, None]
        & (t_idx >= hist)
        & (t_idx < end[:, None] - fut)
    )

    return EpisodeBuffer(
        ego_x=traj10["x"], ego_y=traj10["y"], ego_yaw=traj10["yaw"],
        speed=traj10["speed"], acc_x=traj10["acc_x"], acc_y=traj10["acc_y"],
        throttle=traj10["throttle"], brake=traj10["brake"],
        steer=traj10["steer"], reverse=traj10["reverse"],
        npc_valid=final.scene.npc_valid, npc_yaw=final.scene.npc_yaw,
        target_idx=final.scene.target_idx, weather=weather,
        valid=valid, success=success,
    )


def normalize_images(rgb):
    """[0,1] RGB -> ImageNet-normalized (the reference's ProcessImage,
    carla_dataset.py:494-515)."""
    return (rgb - IMAGENET_MEAN) / IMAGENET_STD


def mirror_batch(batch: dict, mask: jnp.ndarray) -> dict:
    """Reflect the selected samples across the ego's longitudinal axis.

    mask: (B,) bool. Exact world-level mirror expressed as tensor ops (see
    TrainConfig.mirror_aug and the mirror module): images/depth swap
    left<->right cameras and flip the pixel column axis, the BEV seg flips
    its +y (rightward) column axis, target_point negates lateral offset and
    relative yaw, ego_motion negates the lateral (centripetal)
    acceleration, and the steer labels (token sequence + raw) negate.
    Throttle/brake/reverse are invariant.
    """

    def sel(m, a, b):
        shape = (-1,) + (1,) * (a.ndim - 1)
        return jnp.where(m.reshape(shape), a, b)

    images, ego_motion, target = mirror_lib.mirror_observation(
        batch["images"], batch["ego_motion"], batch["target_point"])
    depth = mirror_lib.mirror_images(batch["depth"])
    seg = batch["segmentation"][:, :, ::-1]
    steer = -batch["gt_steer"]
    # retokenize the mirrored steer; throttle/brake/reverse columns are
    # rebuilt identically from the stored raw controls
    frames = tok.tokenize(jnp.maximum(batch["gt_acc"], 0.0),
                          jnp.maximum(-batch["gt_acc"], 0.0),
                          steer, batch["gt_reverse"].astype(jnp.float32))
    gt_control = tok.build_sequence(frames, batch["gt_control"].shape[-1])

    out = dict(batch)
    out["images"] = sel(mask, images, batch["images"])
    out["depth"] = sel(mask, depth, batch["depth"])
    out["segmentation"] = sel(mask, seg, batch["segmentation"])
    out["target_point"] = sel(mask, target, batch["target_point"])
    out["ego_motion"] = sel(mask, ego_motion, batch["ego_motion"])
    out["gt_steer"] = sel(mask, steer, batch["gt_steer"])
    out["gt_control"] = sel(mask, gt_control, batch["gt_control"])
    return out


def sample_frame_indices(buffer: EpisodeBuffer, key: jax.Array,
                         batch_size: int, goal_boost: float = 1.0,
                         goal_window: int = 20):
    """Draw (episode, frame) training indices over the valid mask.

    Uniform over valid frames by default; with goal_boost != 1, the last
    `goal_window` valid frames of each episode (the trim/hold approach into
    the slot, where APE/AOE are decided) sample with weight `goal_boost`.
    """
    E, T = buffer.valid.shape
    p = buffer.valid.astype(jnp.float32)  # (E, T)
    if goal_boost != 1.0:
        # index of each episode's last valid frame (= end - future_frames -
        # 1, the frame closest to the parked pose that still has labels);
        # episodes with no valid frames get argmax=0 and weight*0 anyway
        last = T - 1 - jnp.argmax(buffer.valid[:, ::-1], axis=1)  # (E,)
        near_goal = jnp.arange(T)[None, :] > last[:, None] - goal_window
        p = p * jnp.where(near_goal, goal_boost, 1.0)
    p = p.reshape(-1)
    p = p / jnp.maximum(p.sum(), 1.0)
    flat = jax.random.choice(key, E * T, (batch_size,), replace=True, p=p)
    return flat // T, flat % T


def make_batch(buffer: EpisodeBuffer, key: jax.Array, batch_size: int,
               model_cfg: ModelConfig, sim_cfg: SimConfig,
               mirror_aug: bool = False, goal_boost: float = 1.0,
               goal_window: int = 20):
    """Sample a training batch and render it. Returns the training dict.

    Jittable end-to-end: index sampling, state gathers, camera + BEV
    rendering, tokenization. This IS the input pipeline — there are no host
    workers to keep fed.

    mirror_aug: reflect a random half of the batch across the ego's
    longitudinal axis (TrainConfig.mirror_aug).

    goal_boost/goal_window: terminal-precision lever
    (TrainConfig.goal_boost) — the last `goal_window` valid frames of each
    episode (the trim/hold approach into the slot) sample with weight
    `goal_boost` instead of 1.
    """
    if mirror_aug:
        k_idx, k_mirror = jax.random.split(key, 2)
    else:
        k_idx, = jax.random.split(key, 1)
    e_idx, t_idx = sample_frame_indices(buffer, k_idx, batch_size,
                                        goal_boost, goal_window)

    def gather(a):
        return a[e_idx, t_idx]

    ego_x, ego_y, ego_yaw = gather(buffer.ego_x), gather(buffer.ego_y), gather(buffer.ego_yaw)
    scenes = SceneState(
        npc_valid=buffer.npc_valid[e_idx],
        npc_yaw=buffer.npc_yaw[e_idx],
        goal_free=~buffer.npc_valid[e_idx],
        target_idx=buffer.target_idx[e_idx],
    )
    weather = buffer.weather[e_idx]

    cams = render_batch(ego_x, ego_y, ego_yaw, scenes, sim_cfg, weather)
    images = normalize_images(cams["rgb"])  # (B, 4, H, W, 3)
    depth = cams["depth"]  # (B, 4, H, W)

    seg = jax.vmap(
        lambda x, y, yaw, sc: render_bev_seg(x, y, yaw, sc, model_cfg, sim_cfg)
    )(ego_x, ego_y, ego_yaw, scenes)

    target_point = jax.vmap(target_in_ego_frame)(ego_x, ego_y, ego_yaw, scenes)

    ego_motion = jnp.stack(
        [gather(buffer.speed), gather(buffer.acc_x), gather(buffer.acc_y)],
        axis=-1)[:, None, :]  # (B, 1, 3)

    # future controls at t+1..t+fut (reference carla_dataset.py:322-341)
    fut = model_cfg.future_frame_nums
    offs = jnp.arange(1, fut + 1)
    tt = t_idx[:, None] + offs[None, :]  # (B, fut)
    ee = e_idx[:, None]
    throttle = buffer.throttle[ee, tt]
    brake = buffer.brake[ee, tt]
    steer = buffer.steer[ee, tt]
    reverse = buffer.reverse[ee, tt].astype(jnp.float32)
    frames = tok.tokenize(throttle, brake, steer, reverse)  # (B, fut, 3)
    gt_control = tok.build_sequence(frames, model_cfg.tf_de_tgt_dim)

    # raw signed acc (throttle or -brake), as add_raw_control records
    gt_acc = jnp.where(brake != 0.0, -brake, throttle)

    batch = {
        "images": images,
        "depth": depth,
        "segmentation": seg,
        "ego_motion": ego_motion,
        "target_point": target_point,
        "gt_control": gt_control,
        "gt_acc": gt_acc,
        "gt_steer": steer,
        "gt_reverse": buffer.reverse[ee, tt].astype(jnp.int32),
    }
    if mirror_aug:
        batch = mirror_batch(
            batch, jax.random.bernoulli(k_mirror, 0.5, (batch_size,)))
    return batch
