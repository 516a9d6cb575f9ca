"""Scripted parking expert: a geometric reverse-in maneuver, fully jittable.

Replaces the reference's human teleop data source (data_generation/
keyboard_control.py — WASD + Q-reverse driving recorded into episodes). The
expert produces the same kind of demonstrations (approach along the aisle,
arc-reverse into the slot, trim, hold stopped in reverse) as a pure function
of simulator state, so on-device data generation vmaps over thousands of
parallel episodes.

Maneuver geometry (slot axis = world x, aisle along y, see sim/scene.py):

    phase 0 APPROACH    drive forward along the aisle, slowing into the
                        trigger point y = slot_y + h * R
    phase 1 ARC         reverse with the steer whose turning radius R equals
                        the lateral aisle->slot distance; a 90 deg arc lands
                        the rear axle near the slot center line
    phase 2 STRAIGHT    reverse along the slot axis with yaw + cross-track
                        feedback, into the slot
    phase 3 TRIM        creep forward/backward along the slot axis to center
    phase 4 HOLD        stopped, reverse gear engaged (the eval success
                        machine requires a stop in reverse,
                        network_evaluator.py:336)

where h = +-1 is the approach heading and R = |slot_x - aisle_x|.

Steering sign conventions follow the sim's left-handed frame (x fwd, y
right, steer>0 raises yaw; reversing flips the yaw response), see
sim/vehicle.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from e2e_parking_carla_tpu.config import SimConfig
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.env import EgoState, SceneState
from e2e_parking_carla_tpu.sim.vehicle import VehicleControl

AISLE_X = scene_lib.EGO_START_X  # approach line (start poses sit on it)


@struct.dataclass
class ExpertState:
    phase: jnp.ndarray  # i32
    trim_frames: jnp.ndarray  # i32 — frames spent in the trim phase
    leg: jnp.ndarray  # i32 — trim direction: 0 reverse-in, 1 forward-out
    arc_R: jnp.ndarray  # f32 — turning radius captured at arc entry (0 = unset)

    @classmethod
    def init(cls, batch_shape=()):
        return cls(phase=jnp.zeros(batch_shape, jnp.int32),
                   trim_frames=jnp.zeros(batch_shape, jnp.int32),
                   leg=jnp.zeros(batch_shape, jnp.int32),
                   arc_R=jnp.zeros(batch_shape, jnp.float32))


def _wrap(a):
    return a - 2.0 * jnp.pi * jnp.round(a / (2.0 * jnp.pi))


def expert_policy(ego: EgoState, scene: SceneState, est: ExpertState,
                  sim_cfg: SimConfig):
    """One expert decision. Returns (VehicleControl, ExpertState). Pure; vmap
    over a fleet. Call every frame (30 Hz) or at the 10 Hz policy rate."""
    slot = jnp.asarray(scene_lib.SLOT_XY)[scene.target_idx]
    sx, sy = slot[0], slot[1]
    side = jnp.sign(sx - AISLE_X)  # +1: slot on the +x side of the aisle
    h = jnp.where(jnp.sin(ego.yaw) >= 0, 1.0, -1.0)  # approach heading sign

    # rear axle (the bicycle reference point)
    rx = ego.x - sim_cfg.rear_axle_to_center * jnp.cos(ego.yaw)
    ry = ego.y - sim_cfg.rear_axle_to_center * jnp.sin(ego.yaw)

    # live lateral distance from the rear axle to the slot's x line; the
    # radius is frozen at arc entry so the whole 90-degree arc is consistent
    R_live = jnp.maximum(jnp.abs(sx - rx), 2.0)
    R = jnp.where(est.arc_R > 0, est.arc_R, R_live)
    arc_steer_mag = jnp.clip(
        jnp.arctan(sim_cfg.wheelbase / R) / sim_cfg.max_steer_rad, 0.0, 1.0)
    # final heading points back at the aisle: -side * x_hat
    yaw_goal = jnp.where(side > 0, jnp.pi, 0.0)
    yaw_err = _wrap(ego.yaw - yaw_goal)
    lat = ry - sy  # cross-track from the slot center line
    t_rear_x = sx + side * sim_cfg.rear_axle_to_center
    along_err = side * (t_rear_x - rx)  # >0: reverse deeper into the slot

    phase = est.phase

    # ---------- phase 0: approach along the aisle ----------
    dist_to_trigger = h * (sy + h * R_live - ry)  # >0 while short of trigger
    v0 = jnp.clip(1.6 * dist_to_trigger, 0.0, 3.3)
    aisle_lat = ego.x - AISLE_X
    # desired heading = aisle heading + correction toward the line
    e0 = _wrap(ego.yaw - (h * jnp.pi / 2 + h * jnp.clip(0.5 * aisle_lat, -0.35, 0.35)))
    steer0 = jnp.clip(-2.0 * e0, -1.0, 1.0)

    # ---------- phase 1: reverse arc ----------
    steer1 = -side * h * arc_steer_mag

    # ---------- phases 2/3: line tracking along the slot axis ----------
    # desired yaw offset: reversing -> -side*k*lat; forward -> +side*k*lat
    # cross-track coupling fades out near the slot so yaw settles to zero
    # exactly where the alignment gates need it
    fade = jnp.clip(along_err / 1.5, 0.0, 1.0)
    k_lat = 0.55
    e_rev = yaw_err - (-side * jnp.clip(k_lat * lat, -0.5, 0.5) * fade)
    steer_rev = jnp.clip(3.5 * e_rev, -1.0, 1.0)
    # trim legs: yaw servo plus a lateral term that FADES OUT near the
    # parked point (a constant lat bias would hold yaw off zero exactly
    # where the alignment gate needs it at zero); sign flips with travel
    # direction, so out-and-back cycles bleed off both residual yaw and
    # cross-track error
    lat_term = jnp.clip(0.4 * lat, -0.3, 0.3) * fade
    steer_trim_rev = jnp.clip(3.0 * (yaw_err + side * lat_term), -1.0, 1.0)
    steer_trim_fwd = jnp.clip(-3.0 * (yaw_err - side * lat_term), -1.0, 1.0)

    # decelerate with remaining depth so phase 2 ends slow (yaw feedback
    # keeps converging while creeping)
    v2 = -jnp.clip(0.9 * along_err, 0.12, 1.4)
    # trim legs: leg 0 backs to the rear target; leg 1 pulls ~1.3 m out
    # toward the aisle (yaw feedback active on both legs, so each
    # out-and-back cycle bleeds off residual yaw error)
    on_fwd_leg = est.leg == 1
    v3_in = jnp.clip(-2.2 * along_err, -1.2, 1.2)
    v3_out = jnp.clip(2.2 * (1.3 - along_err), 0.0, 1.2)
    v3 = jnp.where(on_fwd_leg, v3_out, v3_in)
    steer3 = jnp.where(v3 < 0, steer_trim_rev, steer_trim_fwd)

    v_want = jnp.where(phase == 0, v0,
                       jnp.where(phase == 1, -1.6,
                                 jnp.where(phase == 2, v2,
                                           jnp.where(phase == 3, v3, 0.0))))
    steer = jnp.where(phase == 0, steer0,
                      jnp.where(phase == 1, steer1,
                                jnp.where(phase == 2, steer_rev,
                                          jnp.where(phase == 3, steer3, 0.0))))

    # ---------- longitudinal: P-control with gear from sign(v_want) ----------
    reverse = v_want < -1e-3
    gear = jnp.where(reverse, -1.0, 1.0)
    dv = (v_want - ego.v) * gear  # >0: need more speed in the gear direction
    throttle = jnp.clip(1.3 * dv, 0.0, 0.7)
    # breakaway floor: weak commands can't beat rolling-resistance stiction
    breakaway = sim_cfg.rolling_decel / sim_cfg.max_throttle_accel + 0.05
    throttle = jnp.where(dv > 0.03, jnp.maximum(throttle, breakaway), throttle)
    brake = jnp.clip(-1.2 * dv, 0.0, 1.0)
    stopping = jnp.abs(v_want) < 1e-3
    throttle = jnp.where(stopping, 0.0, throttle)
    brake = jnp.where(stopping, 1.0, brake)

    # ---------- phase transitions ----------
    at_trigger = (dist_to_trigger < 0.08) & (jnp.abs(ego.v) < 0.3)
    arc_done = jnp.abs(yaw_err) < jnp.radians(4.0)
    deep_enough = along_err < 0.03
    centered = (jnp.abs(along_err) < 0.04) & (jnp.abs(lat) < 0.3) \
        & (jnp.abs(yaw_err) < jnp.radians(0.45)) & (jnp.abs(ego.v) < 0.05)

    trim_frames = jnp.where(phase == 3, est.trim_frames + 1, est.trim_frames)
    give_up = trim_frames > 240  # 8 s of trimming: hold with what we have
    parked = (jnp.abs(along_err) < 0.04) & (jnp.abs(ego.v) < 0.05)
    yaw_good = jnp.abs(yaw_err) < jnp.radians(0.40)
    lat_good = jnp.abs(lat) < 0.3
    # leg transitions: parked but misaligned -> pull out; pulled out -> back in
    new_leg = jnp.where(
        (phase == 3) & (est.leg == 0) & parked & ~(yaw_good & lat_good), 1,
        jnp.where((phase == 3) & (est.leg == 1) & (along_err > 1.2), 0, est.leg))
    new_phase = jnp.where(
        (phase == 0) & at_trigger, 1,
        jnp.where((phase == 1) & arc_done, 2,
                  jnp.where((phase == 2) & deep_enough, 3,
                            jnp.where((phase == 3) & (est.leg == 0) & parked
                                      & ((yaw_good & lat_good & centered)
                                         | give_up),
                                      4, phase))))
    # freeze the arc radius at the 0 -> 1 transition
    new_arc_R = jnp.where((phase == 0) & at_trigger, R_live, est.arc_R)

    hold = new_phase == 4
    control = VehicleControl(
        throttle=jnp.where(hold, 0.0, throttle),
        brake=jnp.where(hold, 1.0, brake),
        steer=jnp.where(hold, 0.0, steer),
        reverse=jnp.where(hold, True, reverse),
    )
    return control, ExpertState(phase=new_phase.astype(jnp.int32),
                                trim_frames=trim_frames.astype(jnp.int32),
                                leg=new_leg.astype(jnp.int32),
                                arc_R=new_arc_R.astype(jnp.float32))
