"""Ego-centric BEV semantic ground truth, rasterized on-device.

Replaces the reference's two-stage pipeline — a torch/pygame top-down
renderer (data_generation/bev_render.py) whose 15-channel output is
bit-packed to PNG (data_generation/tools.py:9-24) and later thresholded back
into 3 classes by the dataset (dataset/carla_dataset.py:426-491
ProcessSemantic) — with a direct analytic rasterization of the scene state.

Output contract (matches what ProcessSemantic feeds the seg loss):
* (200, 200) int32 grid over ego-frame x,y in [-10, 10) m at 0.1 m,
  row index i grows with +x (vehicle forward), column j with +y (right),
* class 0 = background, 1 = vehicle, 2 = target slot (2 overwrites 1),
* the target slot is a 5.5 m x 3.1 m rectangle rotated to the slot's yaw
  (the reference stamps 55x31 px, carla_dataset.py:472-491).

Documented divergences: cells are aligned to the lift-splat voxel grid
(floor((p - min)/res)), a half-cell shift from the reference's image
resampling; the ego vehicle is not painted (the policy never needs its own
footprint, and the reference's threshold-75 channel keeps it out of class 1
in practice).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from e2e_parking_carla_tpu.config import ModelConfig, SimConfig
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.collision import point_in_obb
from e2e_parking_carla_tpu.sim.env import SceneState


def bev_cell_centers(model_cfg: ModelConfig) -> np.ndarray:
    """(H, W, 2) ego-frame cell-center coordinates. Host-side constant."""
    x0, _, dx = model_cfg.bev_x_bound
    y0, _, dy = model_cfg.bev_y_bound
    nx, ny = model_cfg.bev_size
    xs = x0 + (np.arange(nx, dtype=np.float32) + 0.5) * dx
    ys = y0 + (np.arange(ny, dtype=np.float32) + 0.5) * dy
    out = np.zeros((nx, ny, 2), np.float32)
    out[..., 0] = xs[:, None]
    out[..., 1] = ys[None, :]
    return out


def render_bev_seg(ego_x, ego_y, ego_yaw, scene: SceneState,
                   model_cfg: ModelConfig, sim_cfg: SimConfig):
    """(H, W) int32 semantic BEV for one env. vmap over a batch.

    ego pose is the bbox center / world yaw in radians (as in EnvState).
    """
    cells_ego = jnp.asarray(bev_cell_centers(model_cfg))  # (H, W, 2)
    c, s = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
    # ego -> world
    wx = cells_ego[..., 0] * c - cells_ego[..., 1] * s + ego_x
    wy = cells_ego[..., 0] * s + cells_ego[..., 1] * c + ego_y
    cells_world = jnp.stack([wx, wy], axis=-1)  # (H, W, 2)

    # vehicles: any valid NPC OBB containing the cell center. Only slots
    # within the grid's reach can contribute — cull to the K nearest before
    # the dense per-cell test (4x fewer tests; exact, since the BEV spans
    # +-10 m and slot pitch is ~3 m, so >24 slots can never intersect it).
    slot_xy = jnp.asarray(scene_lib.SLOT_XY)  # (S, 2)
    K = 24
    d2 = (slot_xy[:, 0] - ego_x) ** 2 + (slot_xy[:, 1] - ego_y) ** 2
    d2 = jnp.where(scene.npc_valid, d2, jnp.inf)
    neg_d2, near_idx = jax.lax.top_k(-d2, K)
    near_xy = slot_xy[near_idx]  # (K, 2)
    near_yaw = scene.npc_yaw[near_idx]
    near_valid = scene.npc_valid[near_idx] & (-neg_d2 < (14.2 + 2.6) ** 2)

    npc_half = jnp.array([sim_cfg.npc_half_length, sim_cfg.npc_half_width], jnp.float32)
    inside = point_in_obb(
        cells_world[:, :, None, :],  # (H, W, 1, 2)
        near_xy[None, None, :, :],  # (1, 1, K, 2)
        near_yaw[None, None, :],
        npc_half[None, None, None, :],
    )  # (H, W, K)
    vehicle = jnp.any(inside & near_valid[None, None, :], axis=-1)

    # target slot rectangle (world frame: slot axis along world x)
    target_xy = slot_xy[scene.target_idx]
    slot_half = jnp.array([sim_cfg.slot_half_length, sim_cfg.slot_half_width], jnp.float32)
    target = point_in_obb(cells_world, target_xy, jnp.radians(scene_lib.SLOT_YAW_DEG), slot_half)

    seg = jnp.where(target, 2, jnp.where(vehicle, 1, 0))
    return seg.astype(jnp.int32)


def render_bev_seg_batch(ego_x, ego_y, ego_yaw, scene: SceneState,
                         model_cfg: ModelConfig, sim_cfg: SimConfig):
    """Batched variant via vmap (leading dim on ego pose + scene)."""
    import jax

    return jax.vmap(
        lambda x, y, yaw, sc: render_bev_seg(x, y, yaw, sc, model_cfg, sim_cfg)
    )(ego_x, ego_y, ego_yaw, scene)


def target_in_ego_frame(ego_x, ego_y, ego_yaw, scene: SceneState):
    """Target slot [x, y, yaw_deg] in the ego frame — the model's
    `target_point` input (reference carla_dataset.py:344-348)."""
    from e2e_parking_carla_tpu import geometry as geo

    slot_xy = jnp.asarray(scene_lib.SLOT_XY)[scene.target_idx]
    pos = geo.world_to_ego_xy(slot_xy, jnp.stack([ego_x, ego_y]), ego_yaw)
    dyaw = geo.wrap_angle_deg(scene_lib.SLOT_YAW_DEG - jnp.degrees(ego_yaw))
    return jnp.concatenate([pos, dyaw[None]], axis=-1)
