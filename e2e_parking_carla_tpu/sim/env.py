"""The parking environment: pure-functional reset/step with both the
data-generation and closed-loop-evaluation state machines.

Rebuilds, as jittable bookkeeping over static-shape arrays, the logic of the
reference's per-frame Python loops:

* termination + metric machine: data_generation/network_evaluator.py:137-184
  (collision/timeout/out-of-bounds) and :312-408 (stop-based success/fail
  boxes against the closest free slot),
* data-gen success check: data_generation/data_generator.py:117-152
  (0.5 m / 0.5 deg held 60 frames),
* episode setup: world.py:145-188 (static NPCs), parking_position.py:105-157
  (start-pose sweeps).

One `step_env` call = one 30 Hz frame. vmap over a fleet; lax.scan over time.
Terminal states freeze (steps become no-ops), so a whole batched protocol is
a single fixed-length scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from e2e_parking_carla_tpu.config import EvalConfig, SimConfig
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.collision import ego_hits_npcs
from e2e_parking_carla_tpu.sim.vehicle import (
    VehicleControl,
    center_from_rear_axle,
    rear_axle_from_center,
    step_vehicle,
)


class Status:
    """Terminal status codes (reference metric taxonomy,
    network_evaluator.py:100-112)."""

    RUNNING = 0
    TARGET_SUCCESS = 1
    TARGET_FAIL = 2
    NO_TARGET_SUCCESS = 3
    NO_TARGET_FAIL = 4
    COLLISION = 5
    OUTBOUND = 6
    TIMEOUT = 7


@struct.dataclass
class EgoState:
    x: jnp.ndarray  # bbox-center x (m, world) — CARLA reports actor centers
    y: jnp.ndarray
    yaw: jnp.ndarray  # rad
    v: jnp.ndarray  # signed speed m/s
    acc_x: jnp.ndarray  # longitudinal accel (m/s^2), IMU-equivalent
    acc_y: jnp.ndarray  # lateral (centripetal) accel


@struct.dataclass
class SceneState:
    npc_valid: jnp.ndarray  # (S,) bool — slot has a parked vehicle
    npc_yaw: jnp.ndarray  # (S,) rad
    goal_free: jnp.ndarray  # (S,) bool — slot is a valid parking goal
    target_idx: jnp.ndarray  # i32 — commanded slot


@struct.dataclass
class EnvState:
    ego: EgoState
    scene: SceneState
    frames_total: jnp.ndarray  # i32
    frames_in_goal: jnp.ndarray
    frames_nearby_goal: jnp.ndarray
    frames_nearby_no_goal: jnp.ndarray
    frames_outbound: jnp.ndarray
    status: jnp.ndarray  # i32, Status.*
    final_pos_err: jnp.ndarray  # f32, valid on success
    final_orient_err: jnp.ndarray
    final_time: jnp.ndarray  # seconds

    @property
    def done(self):
        return self.status != Status.RUNNING


def _i32(v=0):
    return jnp.asarray(v, jnp.int32)


def reset_env(key: jax.Array, target_idx, start_x, start_y, start_yaw) -> EnvState:
    """Fresh episode: sample static NPCs (target slot kept free) and place
    the ego at the given start pose (bbox center, world frame, yaw rad)."""
    npc_valid, npc_yaw, goal_free = scene_lib.sample_scene(key, target_idx)
    ego = EgoState(
        x=jnp.asarray(start_x, jnp.float32),
        y=jnp.asarray(start_y, jnp.float32),
        yaw=jnp.asarray(start_yaw, jnp.float32),
        v=jnp.float32(0.0),
        acc_x=jnp.float32(0.0),
        acc_y=jnp.float32(0.0),
    )
    return EnvState(
        ego=ego,
        scene=SceneState(
            npc_valid=npc_valid,
            npc_yaw=npc_yaw,
            goal_free=goal_free,
            target_idx=jnp.asarray(target_idx, jnp.int32),
        ),
        frames_total=_i32(),
        frames_in_goal=_i32(),
        frames_nearby_goal=_i32(),
        frames_nearby_no_goal=_i32(),
        frames_outbound=_i32(),
        status=_i32(Status.RUNNING),
        final_pos_err=jnp.float32(0.0),
        final_orient_err=jnp.float32(0.0),
        final_time=jnp.float32(0.0),
    )


def _orientation_diff_deg(yaw_rad):
    """Angle to the slot axis: min(|yaw|, 180-|yaw|) in degrees, yaw wrapped
    (reference network_evaluator.py:327)."""
    yaw_deg = jnp.degrees(yaw_rad)
    yaw_deg = yaw_deg - 360.0 * jnp.round(yaw_deg / 360.0)  # wrap to [-180,180]
    a = jnp.abs(yaw_deg)
    return jnp.minimum(a, 180.0 - a)


def _closest_goal(ego_x, ego_y, scene: SceneState):
    """Closest free slot: (index, distance, |dx|, |dy|, slot_xy)."""
    slot_xy = jnp.asarray(scene_lib.SLOT_XY)
    d2 = (slot_xy[:, 0] - ego_x) ** 2 + (slot_xy[:, 1] - ego_y) ** 2
    d2 = jnp.where(scene.goal_free, d2, jnp.inf)
    idx = jnp.argmin(d2)
    gx, gy = slot_xy[idx, 0], slot_xy[idx, 1]
    return idx, jnp.sqrt(d2[idx]), jnp.abs(ego_x - gx), jnp.abs(ego_y - gy)


def step_env(
    state: EnvState,
    control: VehicleControl,
    sim_cfg: SimConfig,
    eval_cfg: EvalConfig,
) -> EnvState:
    """One 30 Hz evaluation frame: physics, then the reference's termination
    checks in priority order collision > timeout > out-of-bounds > stop-based
    goal machine (network_evaluator.py:137-184). Frozen once terminal."""
    running = state.status == Status.RUNNING

    # --- physics (world.tick equivalent) ---
    rx, ry = rear_axle_from_center(state.ego.x, state.ego.y, state.ego.yaw, sim_cfg)
    nrx, nry, nyaw, nv = step_vehicle(rx, ry, state.ego.yaw, state.ego.v, control, sim_cfg)
    ncx, ncy = center_from_rear_axle(nrx, nry, nyaw, sim_cfg)
    acc_x = (nv - state.ego.v) / sim_cfg.dt
    acc_y = nv * (nyaw - state.ego.yaw) / sim_cfg.dt
    new_ego = EgoState(x=ncx, y=ncy, yaw=nyaw, v=nv, acc_x=acc_x, acc_y=acc_y)
    ego = jax.tree.map(lambda n, o: jnp.where(running, n, o), new_ego, state.ego)

    frames_total = jnp.where(running, state.frames_total + 1, state.frames_total)

    # --- collision ---
    hit = ego_hits_npcs(
        jnp.stack([ego.x, ego.y]),
        ego.yaw,
        jnp.array([sim_cfg.ego_half_length, sim_cfg.ego_half_width], jnp.float32),
        jnp.asarray(scene_lib.SLOT_XY),
        state.scene.npc_yaw,
        state.scene.npc_valid,
        jnp.array([sim_cfg.npc_half_length, sim_cfg.npc_half_width], jnp.float32),
    )

    # --- timeout ---
    timeout = frames_total > eval_cfg.frames_total_needed

    # --- out of bounds (10 s sustained) ---
    outside = scene_lib.is_out_of_bound(ego.x, ego.y)
    frames_outbound = jnp.where(outside, state.frames_outbound + 1, 0)
    outbound = frames_outbound > eval_cfg.frames_outbound_needed

    # --- stop-based goal machine (eva_check_goal) ---
    goal_idx, dist, dx, dy = _closest_goal(ego.x, ego.y, state.scene)
    odiff = _orientation_diff_deg(ego.yaw)
    speed_kmh = 3.6 * jnp.abs(ego.v)
    is_stop = (control.throttle == 0.0) & (speed_kmh < 1e-3) & control.reverse

    in_box = (
        (dx <= eval_cfg.goal_reach_x_diff)
        & (dy <= eval_cfg.goal_reach_y_diff)
        & (odiff <= eval_cfg.goal_reach_orientation_diff)
    )
    near_box = (
        ((dx > eval_cfg.goal_reach_x_diff) & (dx <= 2 * eval_cfg.goal_reach_x_diff))
        | ((dy > eval_cfg.goal_reach_y_diff) & (dy <= 2 * eval_cfg.goal_reach_y_diff))
        | ((odiff > eval_cfg.goal_reach_orientation_diff)
           & (odiff <= 2 * eval_cfg.goal_reach_orientation_diff))
    )
    is_target = goal_idx == state.scene.target_idx

    frames_in_goal = jnp.where(is_stop & in_box, state.frames_in_goal + 1,
                               jnp.where(is_stop, state.frames_in_goal, 0))
    frames_nearby_goal = jnp.where(
        is_stop & near_box & is_target, state.frames_nearby_goal + 1,
        jnp.where(is_stop, state.frames_nearby_goal, 0))
    frames_nearby_no_goal = jnp.where(
        is_stop & near_box & ~is_target, state.frames_nearby_no_goal + 1,
        jnp.where(is_stop, state.frames_nearby_no_goal, 0))

    success = frames_in_goal > eval_cfg.frames_in_goal_needed
    target_fail = frames_nearby_goal > eval_cfg.frames_nearby_goal_needed
    nt_fail = frames_nearby_no_goal > eval_cfg.frames_nearby_goal_needed

    # priority: collision > timeout > outbound > success > fail
    status = jnp.where(
        hit, Status.COLLISION,
        jnp.where(
            timeout, Status.TIMEOUT,
            jnp.where(
                outbound, Status.OUTBOUND,
                jnp.where(
                    success,
                    jnp.where(is_target, Status.TARGET_SUCCESS, Status.NO_TARGET_SUCCESS),
                    jnp.where(
                        target_fail, Status.TARGET_FAIL,
                        jnp.where(nt_fail, Status.NO_TARGET_FAIL, Status.RUNNING),
                    ),
                ),
            ),
        ),
    ).astype(jnp.int32)
    status = jnp.where(running, status, state.status)
    just_succeeded = running & success & (status == Status.TARGET_SUCCESS)

    return EnvState(
        ego=ego,
        scene=state.scene,
        frames_total=frames_total,
        frames_in_goal=jnp.where(running, frames_in_goal, state.frames_in_goal),
        frames_nearby_goal=jnp.where(running, frames_nearby_goal, state.frames_nearby_goal),
        frames_nearby_no_goal=jnp.where(running, frames_nearby_no_goal, state.frames_nearby_no_goal),
        frames_outbound=jnp.where(running, frames_outbound, state.frames_outbound),
        status=status,
        final_pos_err=jnp.where(just_succeeded, dist, state.final_pos_err),
        final_orient_err=jnp.where(just_succeeded, odiff, state.final_orient_err),
        final_time=jnp.where(
            just_succeeded, frames_total.astype(jnp.float32) / sim_cfg.fps, state.final_time
        ),
    )


def datagen_goal_check(ego: EgoState, scene: SceneState, frames_in_goal,
                       sim_cfg: SimConfig):
    """Data-generation success machine (data_generator.py:117-152): within
    0.5 m and 0.5 deg of the closest free slot for 60 consecutive frames.

    Returns (new_frames_in_goal, reached). Roll/pitch are identically 0 here,
    so the reference's sqrt(yaw^2 + roll^2 + pitch^2) reduces to the yaw term.
    """
    _, dist, _, _ = _closest_goal(ego.x, ego.y, scene)
    odiff = _orientation_diff_deg(ego.yaw)
    in_goal = (dist < sim_cfg.gen_goal_dist) & (odiff < sim_cfg.gen_goal_rot)
    frames = jnp.where(in_goal, frames_in_goal + 1, 0)
    return frames, frames > sim_cfg.gen_goal_frames


def eval_metrics(final_states: EnvState, eval_cfg: EvalConfig):
    """Aggregate a batch of terminal EnvStates into the reference's metric
    set (network_evaluator.py:410-448): rates in percent over attempts, and
    means of position/orientation error + parking time over target successes.
    """
    status = final_states.status
    n = jnp.maximum(status.shape[0], 1)

    def rate(code):
        return 100.0 * jnp.sum(status == code) / n

    ts = status == Status.TARGET_SUCCESS
    n_ts = jnp.maximum(jnp.sum(ts), 1)
    return {
        "TSR": rate(Status.TARGET_SUCCESS),
        "TFR": rate(Status.TARGET_FAIL),
        "NTSR": rate(Status.NO_TARGET_SUCCESS),
        "NTFR": rate(Status.NO_TARGET_FAIL),
        "CR": rate(Status.COLLISION),
        "OR": rate(Status.OUTBOUND),
        "TR": rate(Status.TIMEOUT),
        "APE": jnp.sum(jnp.where(ts, final_states.final_pos_err, 0.0)) / n_ts,
        "AOE": jnp.sum(jnp.where(ts, final_states.final_orient_err, 0.0)) / n_ts,
        "APT": jnp.sum(jnp.where(ts, final_states.final_time, 0.0)) / n_ts,
    }
