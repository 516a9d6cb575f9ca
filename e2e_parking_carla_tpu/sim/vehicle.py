"""Kinematic-bicycle vehicle dynamics.

Replaces CARLA's UE4 vehicle physics (the reference's ego is a Tesla Model 3
stepped by the external server at 30 FPS fixed delta, data_generation/
world.py:33-38,129-143). Controls match carla.VehicleControl: throttle [0,1],
brake [0,1], steer [-1,1], reverse gear flag.

Simplifications relative to CARLA (documented divergence):
* no engine/gearbox lag — thrust is immediate (the reference agent works
  around CARLA's gear-0 quirk with a forced-throttle heuristic,
  agent/parking_agent.py:415-417; our dynamics don't need it, but the agent
  keeps the speed limits for behavior parity),
* longitudinal model: thrust - brake - quadratic drag - rolling resistance,
  with stiction (velocity snaps to 0 when braking/resistance would cross it),
* planar SE(2) state; z/roll/pitch are identically 0 in the lot.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from e2e_parking_carla_tpu.config import SimConfig


@struct.dataclass
class VehicleControl:
    throttle: jnp.ndarray  # [0, 1]
    brake: jnp.ndarray  # [0, 1]
    steer: jnp.ndarray  # [-1, 1]
    reverse: jnp.ndarray  # bool

    @classmethod
    def zeros(cls, batch_shape=()):
        z = jnp.zeros(batch_shape, jnp.float32)
        return cls(throttle=z, brake=z, steer=z, reverse=jnp.zeros(batch_shape, bool))


def step_vehicle(x, y, yaw, v, control: VehicleControl, cfg: SimConfig):
    """One 1/fps step of the rear-axle kinematic bicycle.

    State: x, y (m, world), yaw (rad), v (m/s, signed; negative = moving
    backwards). Returns updated (x, y, yaw, v).
    """
    dt = cfg.dt
    throttle = jnp.clip(control.throttle, 0.0, 1.0)
    brake = jnp.clip(control.brake, 0.0, 1.0)
    steer = jnp.clip(control.steer, -1.0, 1.0)
    gear = jnp.where(control.reverse, -1.0, 1.0)

    thrust = gear * throttle * cfg.max_throttle_accel
    static_resist = brake * cfg.max_brake_decel + cfg.rolling_decel
    breakaway = jnp.abs(thrust) > static_resist
    # net acceleration starting from rest (0 unless thrust beats resistance)
    v_from_rest = jnp.where(breakaway,
                            (thrust - jnp.sign(thrust) * static_resist) * dt, 0.0)

    v_sign = jnp.sign(v)
    accel_moving = thrust - v_sign * (static_resist + cfg.drag_coeff * v * v)
    v_cand = v + accel_moving * dt
    crossed = v_cand * v < 0.0  # resistance flipped the sign while moving
    # after a zero-crossing the car re-launches only if thrust points the
    # other way and beats static resistance; otherwise stiction holds it
    relaunch = breakaway & (jnp.sign(thrust) == -v_sign)
    v_new = jnp.where(
        v == 0.0, v_from_rest,
        jnp.where(crossed, jnp.where(relaunch, v_from_rest, 0.0), v_cand),
    )
    v_new = jnp.clip(v_new, -cfg.max_speed, cfg.max_speed)

    delta = steer * cfg.max_steer_rad
    yaw_rate = v_new * jnp.tan(delta) / cfg.wheelbase
    yaw_new = yaw + yaw_rate * dt

    # integrate at the mid-heading for second-order accuracy
    mid = 0.5 * (yaw + yaw_new)
    x_new = x + v_new * jnp.cos(mid) * dt
    y_new = y + v_new * jnp.sin(mid) * dt
    return x_new, y_new, yaw_new, v_new


def center_from_rear_axle(x, y, yaw, cfg: SimConfig):
    """Bounding-box center from the rear-axle reference point."""
    return (x + cfg.rear_axle_to_center * jnp.cos(yaw),
            y + cfg.rear_axle_to_center * jnp.sin(yaw))


def rear_axle_from_center(cx, cy, yaw, cfg: SimConfig):
    return (cx - cfg.rear_axle_to_center * jnp.cos(yaw),
            cy - cfg.rear_axle_to_center * jnp.sin(yaw))
