"""Configuration tree for the TPU-native parking framework.

One typed, frozen dataclass tree replaces the reference's scattered config
surface (reference: tool/config.py:7-111 flat ``Configuration`` of typed-None
attributes, config/training.yaml, plus constants hardcoded in
data_generation/world.py:241-317 (camera rig), data_generation/
parking_position.py:30-102 (slot map), data_generation/data_generator.py:42-47
and data_generation/network_evaluator.py:52-69 (success thresholds)).

``load_config`` accepts the reference's YAML schema (a single ``parking_model:``
block, reference config/training.yaml) so reference configs keep working.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Tuple

# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Policy-network hyperparameters.

    Field names/defaults mirror the reference's training.yaml so that configs
    carry over verbatim (reference: config/training.yaml:18-52).
    """

    future_frame_nums: int = 4
    hist_frame_nums: int = 10
    token_nums: int = 204
    image_crop: int = 256

    # BEV encoder
    bev_encoder_in_channel: int = 64
    bev_encoder_out_channel: int = 258  # 256 + 2 ego-motion dims
    bev_encoder_resize: int = 256  # input resize before the ResNet trunk
    # (the reference hardcodes 256, model/bev_encoder.py:24; smaller values
    # shrink the token count for tests/dry runs)

    # BEV / lift-splat grid (reference: config/training.yaml:26-33)
    bev_x_bound: Tuple[float, float, float] = (-10.0, 10.0, 0.1)
    bev_y_bound: Tuple[float, float, float] = (-10.0, 10.0, 0.1)
    bev_z_bound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    d_bound: Tuple[float, float, float] = (0.5, 12.5, 0.25)
    final_dim: Tuple[int, int] = (256, 256)
    bev_down_sample: int = 8
    use_depth_distribution: bool = True
    # "pull": fused lift+splat (each voxel gathers its static contributors;
    # no point-tensor materialization, exact gather-only VJP).
    # "cumsum": the round-1 sorted-prefix-sum path (kept as the
    # reference/parity implementation).
    splat_mode: str = "pull"
    backbone: str = "efficientnet-b4"

    # Segmentation
    seg_classes: int = 3
    seg_vehicle_weights: Tuple[float, ...] = (1.0, 2.0, 2.0)

    # Transformer encoder (feature fusion)
    tf_en_dim: int = 258
    tf_en_heads: int = 6
    tf_en_layers: int = 4
    tf_en_dropout: float = 0.05
    tf_en_bev_length: int = 256
    tf_en_motion_length: int = 3
    tf_en_ffn_dim: int = 2048  # torch nn.TransformerEncoderLayer default

    # Transformer decoder (control prediction)
    tf_de_dim: int = 258
    tf_de_heads: int = 6
    tf_de_layers: int = 4
    tf_de_dropout: float = 0.05
    tf_de_tgt_dim: int = 15
    tf_de_ffn_dim: int = 2048

    # Ablation switches (paper Table III variants).
    decoder_type: str = "transformer"  # "transformer" | "mlp"

    # TPU-specific knobs (no reference equivalent).
    compute_dtype: str = "bfloat16"  # matmul/conv dtype; params stay float32

    # Torch-exact numerics for imported reference checkpoints: symmetric
    # (torchvision-style) padding in the BEV resnet's strided convs/maxpool
    # where the default path uses TF-SAME, BatchNorm eps 1e-5 outside the
    # EfficientNet trunk, LayerNorm eps 1e-5. Off by default — the shipped
    # from-scratch checkpoints were trained under the default semantics.
    # Set true (e.g. `torch_parity: 1` in YAML) when evaluating weights
    # imported from the reference's released .ckpt via cli.import_ckpt;
    # tests/test_torch_e2e.py holds the whole-model logits-parity proof.
    torch_parity: bool = False
    target_noise_px: float = 5.0  # +-px jitter on the target BEV stamp
    # (reference: model/parking_model.py:36-37)

    # ---- derived ----
    @property
    def bos_token(self) -> int:
        # reference: dataset/carla_dataset.py:162-164
        return self.token_nums - 3

    @property
    def eos_token(self) -> int:
        return self.token_nums - 2

    @property
    def pad_token(self) -> int:
        return self.token_nums - 1

    @property
    def valid_token(self) -> int:
        return self.token_nums - 4

    @property
    def depth_channels(self) -> int:
        lo, hi, step = self.d_bound
        return int(round((hi - lo) / step))

    @property
    def bev_size(self) -> Tuple[int, int]:
        nx = int(round((self.bev_x_bound[1] - self.bev_x_bound[0]) / self.bev_x_bound[2]))
        ny = int(round((self.bev_y_bound[1] - self.bev_y_bound[0]) / self.bev_y_bound[2]))
        return nx, ny

    @property
    def feat_hw(self) -> Tuple[int, int]:
        return (self.final_dim[0] // self.bev_down_sample,
                self.final_dim[1] // self.bev_down_sample)

    @property
    def tokens_per_frame(self) -> int:
        return 3  # throttle/brake, steer, reverse

    @property
    def seq_len(self) -> int:
        """BOS + future_frames*3 + EOS + PAD (reference tf_de_tgt_dim=15)."""
        return self.tf_de_tgt_dim


# ---------------------------------------------------------------------------
# Simulator
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """On-device parking-simulator parameters.

    The reference runs CARLA 0.9.11 in synchronous mode at 30 FPS
    (data_generation/world.py:33-38) with a Tesla Model 3 ego
    (world.py:129-143). Our simulator is a kinematic bicycle with a simple
    longitudinal model; constants approximate the CARLA Model 3.
    """

    fps: int = 30
    policy_every: int = 3  # policy/data rate = fps/policy_every = 10 Hz
    # (reference: agent/parking_agent.py:228, data_generator.py:35)

    # Ego vehicle (Tesla Model 3-ish; CARLA bbox extents x=2.396, y=1.081)
    wheelbase: float = 2.875
    ego_half_length: float = 2.40
    ego_half_width: float = 1.08
    # rear-axle to bbox-center offset along +x (bicycle model integrates the
    # rear axle; CARLA transforms are at the bbox center)
    rear_axle_to_center: float = 1.34

    max_steer_rad: float = 0.61  # ~35 deg max front-wheel angle
    max_throttle_accel: float = 3.0  # m/s^2 at throttle=1
    max_brake_decel: float = 8.0  # m/s^2 at brake=1
    drag_coeff: float = 0.10  # quadratic drag (1/m)
    rolling_decel: float = 0.25  # constant rolling resistance m/s^2
    max_speed: float = 15.0  # hard clamp, m/s

    # Static NPC vehicles (generic parked-car box)
    npc_half_length: float = 2.35
    npc_half_width: float = 1.05
    max_static_vehicles: int = 64  # static shape; one per slot max

    # Parking lot slot geometry for rendering/GT (5.5m x 3.1m slots match the
    # reference's 55x31-px target stamp, dataset/carla_dataset.py:478-480)
    slot_half_length: float = 2.75
    slot_half_width: float = 1.55

    # Data-generation success check (reference: data_generator.py:42-47)
    gen_goal_dist: float = 0.5  # m
    gen_goal_rot: float = 0.5  # deg
    gen_goal_frames: int = 60  # 2 s * 30 Hz

    # Camera rig output resolution (post-crop; the reference renders 400x300
    # fov=100 then center-crops 256, world.py:241-246 +
    # dataset/carla_dataset.py:47-63; we render the cropped frame directly)
    cam_width: int = 256
    cam_height: int = 256
    cam_fov_full_width: int = 400  # the focal length is set by the un-cropped
    cam_fov_deg: float = 100.0  # 400-px fov-100 camera

    @property
    def dt(self) -> float:
        return 1.0 / self.fps

    @property
    def focal(self) -> float:
        import math

        return self.cam_fov_full_width / (2.0 * math.tan(math.radians(self.cam_fov_deg) / 2.0))


# ---------------------------------------------------------------------------
# Closed-loop evaluation
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Closed-loop protocol thresholds (reference: network_evaluator.py:52-69,
    carla_parking_eva.py:104-117)."""

    epochs: int = 4
    task_nums: int = 16
    parking_nums: int = 6

    goal_reach_x_diff: float = 1.0  # m
    goal_reach_y_diff: float = 0.6  # m
    goal_reach_orientation_diff: float = 10.0  # deg

    frames_in_goal_needed: int = 60  # 2 s
    frames_nearby_goal_needed: int = 60  # 2 s
    frames_outbound_needed: int = 300  # 10 s
    frames_total_needed: int = 900  # 30 s timeout

    # agent heuristics (reference: parking_agent.py:414-446)
    fwd_speed_limit_kmh: float = 12.0
    rev_speed_limit_kmh: float = 10.0
    stall_seconds: float = 1.0
    stall_boost_throttle: float = 0.3
    settle_seconds: float = 1.0
    use_speed_limit: bool = True  # paper Table III "w/o speed limit" ablation
    mirror_ensemble: bool = False  # test-time mirror ensembling (mirror.py):
    # decode one chain from obs + its ego-axis mirror; exactly
    # chirality-balanced by construction, ~2x encoder cost per step
    env_chunk: int = 48  # envs rolled out per device call (HBM bound: the
    # lift-splat point tensor is ~25 MB/env in bf16 plus f32 prefix sums)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer / run settings (reference: config/training.yaml:2-16,
    trainer/pl_trainer.py:116-121)."""

    data_dir: str = "./e2e_parking/"
    log_dir: str = "./log/"
    checkpoint_dir: str = "./ckpt"
    log_every_n_steps: int = 10
    check_val_every_n_epoch: int = 5

    epochs: int = 155
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    batch_size: int = 12

    training_map: str = "Town04_Opt"
    validation_map: str = "Town04_Opt_Val"

    seed: int = 42
    keep_top_k: int = 3  # top-k checkpoints by val_loss (pl_trainer.py:17-23)

    # parameter EMA decay for the deploy/eval weights (0 disables). Not in
    # the reference; added because closed-loop TSR is extremely sensitive to
    # the exact SGD iterate (STATUS round 1).
    ema_decay: float = 0.999

    # DAgger: fraction of each refreshed buffer collected by rolling out the
    # CURRENT policy with expert-correction labels (0 = pure behavioral
    # cloning, the reference's setting). The expert is queryable at every
    # state on device, so corrections are nearly free. Measured trade-off
    # (b0, 25k steps): frac 0.25 from step 0 drove CR 18%->0.5% but taught
    # timidity (TR 7%->65%) — the expert's phase machine emits conservative
    # labels at the off-manifold states an incompetent mixture visits. Keep
    # the slice small and start it only once the policy is closed-loop
    # competent.
    dagger_envs_frac: float = 0.2
    # probability per env-step that the EXPERT's action (not the policy's)
    # is executed during DAgger collection (beta-mixture; keeps rollouts
    # from leaving the recoverable-state manifold early in training)
    dagger_expert_mix: float = 0.75
    # first training step at which refreshed buffers include a DAgger slice
    dagger_start_step: int = 5000
    # Round-3 label-quality filters (measured round-2 failure: DAgger labels
    # collected under an incompetent mixture teach timidity — TR 7%->65%):
    # drop frames where the expert phase machine sits in HOLD (stop-forever
    # labels at wherever it last gave up) ...
    dagger_drop_hold: bool = True
    # ... and drop whole episodes that end in TIMEOUT/OUTBOUND (confused
    # state-machine trajectories; also the longest episodes, which otherwise
    # dominate uniform frame sampling)
    dagger_drop_timeout: bool = True
    # with dagger_drop_timeout, keep every Nth frame of a timeout episode
    # instead of none (0 = drop all). Timeouts are the round-3 protocol's
    # largest failure class; a stride keeps the expert's recovery labels at
    # policy-stuck states without letting ~290-frame episodes flood the
    # uniform sampler (data/dagger.py:timeout_keep_every)
    dagger_timeout_keep_every: int = 0

    # late-schedule levers (both keyed to the end of the cosine, where
    # closed-loop competence emerges — measured rounds 1-3):
    # multiply the DAgger slice by this once past dagger_late_frac of the
    # schedule (a larger correction slice targets CR/TR without the
    # early-schedule timidity risk); 1.0 disables
    dagger_late_boost: float = 1.0
    dagger_late_frac: float = 0.85
    # multiply probe seeds by this past probe_late_frac of the schedule
    # (late probes carry the selection decision; more attempts cut the
    # binomial share of the adjacent-probe spread)
    probe_late_seed_boost: int = 2
    probe_late_frac: float = 0.8

    # probability that a collection episode starts in the NEAR band
    # (|y - goal_y| <= 3 m) instead of the full +-8 m sweep
    # (sim/scene.py:datagen_start_pose docs). 0 = reference-faithful
    # uniform sweep.
    start_near_frac: float = 0.0

    # Mirror augmentation: reflect half of each training batch across the
    # ego's longitudinal axis (data/rollout.py:mirror_batch). The camera
    # rig is exactly left-right symmetric (geometry.py CAM_RIG: left/right
    # at y=-/+0.8 yaw -/+90, front/rear centered), so the mirrored-world
    # observation through the standard rig IS the left<->right camera swap
    # + horizontal pixel flip of the original render — no re-render, no
    # approximation — and bicycle dynamics mirror-commute, so negating the
    # steer labels is exact. Motivated by the measured protocol asymmetry
    # (flagship + cycle-2, both: -90-heading starts TSR ~60 vs +90 ~78;
    # right-side slots 76 vs left 63.5): the maneuver distribution is
    # handedness-balanced only in expectation, and the policy overfits the
    # sampled imbalance.
    mirror_aug: bool = False

    # DART-style noise injection during EXPERT data collection (Laskey et
    # al. 2017): the executed control is the expert's action plus
    # OU-correlated noise, while the recorded label stays the expert's CLEAN
    # action at every visited state. Covers the off-manifold neighborhood of
    # the expert manifold — where imitation errors otherwise become
    # collisions (measured: the reverse-arc phase passes within 0.15-0.30 m
    # of the next slot's parked car) — WITHOUT the timidity that policy-
    # rollout DAgger labels teach (round-2: TR 7%->65%). sigma=0 disables.
    dart_steer_sigma: float = 0.0
    dart_accel_sigma: float = 0.0
    # OU correlation time in seconds (iid 30 Hz noise is averaged out by
    # vehicle inertia; ~0.5 s excursions actually displace the path)
    dart_tau: float = 0.5
    # noise attenuation inside the precision phases (TRIM/HOLD) so the
    # success gates (|v|<0.05, 0.04 m centering) stay reachable
    dart_trim_scale: float = 0.3

    # Goal-proximity sample weighting (terminal-precision lever): multiply
    # the frame-sampling weight of the last `goal_window` 10 Hz frames of
    # each episode — the trim/hold approach into the slot, where the parked
    # pose error (APE/AOE) is decided — by `goal_boost`. Uniform sampling
    # gives these frames <10% of the batch while the protocol scores the
    # final pose to centimeters (paper Table I: APE 0.30 m); upweighting
    # them targets terminal precision without touching the episode mix
    # (data/rollout.py:make_batch). 1.0 disables.
    goal_boost: float = 1.0
    goal_window: int = 20

    # Cosine-schedule floor as a fraction of the peak LR (reference
    # CosineAnnealingLR decays to 0, pl_trainer.py:116-121; a small floor
    # keeps the late-schedule iterates moving so the EMA/probe-soup
    # selection averages genuinely different weights instead of a frozen
    # endpoint — round-2 finding: closed-loop competence emerges late)
    lr_min_frac: float = 0.05

    # Closed-loop probe selection (train/probe.py): number of independent
    # protocol seeds per probe (averaged — halves selection noise) and the
    # size of the top-K probe-winner weight soup exported alongside the
    # single best snapshot (round-2 finding: greedy argmax over a noisy
    # 48-attempt probe selects noise; probe-best 46.9 scored 30.2 on the
    # full protocol)
    probe_seeds: int = 2
    probe_top_k: int = 5
    # CR weight in the probe selection score TSR - w*CR - 0.5*TR (the
    # round-3 deliverable gates on CR <= 5 next to TSR >= 75, so selection
    # must prefer clean checkpoints over slightly-higher-TSR dirty ones)
    probe_cr_weight: float = 2.0

    # mesh axes: batch is sharded over 'data'; attention heads / mlp hidden
    # over 'model' when model_axis > 1
    data_axis: int = -1  # -1 = all devices
    model_axis: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    sim: SimConfig = dataclasses.field(default_factory=SimConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


# ---------------------------------------------------------------------------
# YAML interop with the reference schema
# ---------------------------------------------------------------------------

_MODEL_KEYS = {f.name for f in dataclasses.fields(ModelConfig)}
_TRAIN_KEYS = {f.name for f in dataclasses.fields(TrainConfig)}


def _coerce(value: Any) -> Any:
    if isinstance(value, list):
        return tuple(_coerce(v) for v in value)
    return value


def config_from_dict(raw: Mapping[str, Any]) -> Config:
    """Build a Config from a flat dict in the reference's training.yaml schema
    (the contents of its ``parking_model:`` block)."""
    model_kwargs = {}
    train_kwargs = {}
    for key, value in raw.items():
        value = _coerce(value)
        if key == "use_depth_distribution":
            value = bool(value)
        if key in _MODEL_KEYS:
            model_kwargs[key] = value
        elif key in _TRAIN_KEYS:
            train_kwargs[key] = value
        # silently ignore unknown keys, mirroring get_cfg's copy-what-matches
    return Config(model=ModelConfig(**model_kwargs), train=TrainConfig(**train_kwargs))


def load_config(path: str) -> Config:
    """Load a YAML config. Accepts both our nested schema and the reference's
    ``parking_model:`` flat block (reference: tool/config.py:56-111)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    if "parking_model" in raw:
        return config_from_dict(raw["parking_model"])
    flat: dict = {}
    for section in ("model", "train"):
        flat.update(raw.get(section, {}))
    if not flat:
        flat = raw
    return config_from_dict(flat)
