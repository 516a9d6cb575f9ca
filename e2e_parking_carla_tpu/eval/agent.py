"""Inference-time policy driver heuristics, vectorized.

Mirrors the reference ParkingAgent's runtime behavior (agent/parking_agent.py):

* 10 Hz decisions held for 3 sim frames (:228,370,412),
* speed limits: cut throttle above 12 km/h forward / 10 km/h reverse
  (:423-428),
* anti-stall boost: if throttle and brake are both ~0 and speed < 2 km/h for
  1 s, force 0.3 throttle for 1 s (:430-446),
* target-point self-tracking: after the first prediction, the target x,y fed
  to the model comes from the centroid of the predicted class-2 BEV
  segmentation (:290-311,474-476); the yaw component stays ground-truth.

The CARLA gear-0 forced-throttle quirk (:415-417) has no equivalent in our
dynamics and is dropped. All state lives in `AgentState` so the whole agent
vmaps over the eval fleet and scans over time.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from e2e_parking_carla_tpu.config import EvalConfig, ModelConfig
from e2e_parking_carla_tpu.sim.vehicle import VehicleControl


@struct.dataclass
class AgentState:
    prev_target_xy: jnp.ndarray  # (2,) ego-frame target from predicted seg
    have_prev: jnp.ndarray  # bool
    stop_count: jnp.ndarray  # i32 (10 Hz ticks)
    boost: jnp.ndarray  # bool
    boost_step: jnp.ndarray  # i32

    @classmethod
    def init(cls, batch_shape=()):
        return cls(
            prev_target_xy=jnp.zeros((*batch_shape, 2), jnp.float32),
            have_prev=jnp.zeros(batch_shape, bool),
            stop_count=jnp.zeros(batch_shape, jnp.int32),
            boost=jnp.zeros(batch_shape, bool),
            boost_step=jnp.zeros(batch_shape, jnp.int32),
        )


def apply_speed_limit(control: VehicleControl, speed_ms, agent: AgentState,
                      eval_cfg: EvalConfig):
    """Post-process the detokenized control (one 10 Hz tick). Returns
    (control, new AgentState)."""
    speed_kmh = 3.6 * jnp.abs(speed_ms)
    throttle = control.throttle
    throttle = jnp.where(
        ~control.reverse & (speed_kmh >= eval_cfg.fwd_speed_limit_kmh), 0.0, throttle)
    throttle = jnp.where(
        control.reverse & (speed_kmh >= eval_cfg.rev_speed_limit_kmh), 0.0, throttle)

    stalled = (throttle < 1e-5) & (control.brake < 1e-5) & (speed_kmh < 2.0)
    stop_count = jnp.where(stalled, agent.stop_count + 1, 0)
    boost = agent.boost | (stop_count > 10)
    boost_step = jnp.where(boost, agent.boost_step + 1, 0)
    throttle = jnp.where(boost, 0.3, throttle)
    end_boost = (boost_step > 10) | (control.brake > 1e-5)
    boost = boost & ~end_boost
    boost_step = jnp.where(end_boost, 0, boost_step)

    new_control = control.replace(throttle=throttle)
    new_agent = agent.replace(stop_count=stop_count.astype(jnp.int32),
                              boost=boost, boost_step=boost_step.astype(jnp.int32))
    return new_control, new_agent


def target_from_seg(seg_logits, model_cfg: ModelConfig):
    """Centroid of the predicted target class in ego coordinates.

    seg_logits (X, Y, C). Returns ((2,) xy, found bool) — the reference's
    save_prev_target/get_target_point_ego_coord (parking_agent.py:290-321).
    """
    X, Y = seg_logits.shape[0], seg_logits.shape[1]
    pred = jnp.argmax(seg_logits, axis=-1)
    w = (pred == 2).astype(jnp.float32)
    n = w.sum()
    found = n > 0
    rows = jnp.arange(X, dtype=jnp.float32)[:, None]
    cols = jnp.arange(Y, dtype=jnp.float32)[None, :]
    mean_r = jnp.sum(rows * w) / jnp.maximum(n, 1.0)
    mean_c = jnp.sum(cols * w) / jnp.maximum(n, 1.0)
    x = (mean_r + 0.5 - X / 2) * model_cfg.bev_x_bound[2]
    y = (mean_c + 0.5 - Y / 2) * model_cfg.bev_y_bound[2]
    return jnp.stack([x, y]), found
