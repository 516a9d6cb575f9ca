"""Geometry: rigid transforms, the surround-camera rig, BEV grid, frustum.

World/vehicle frames follow the CARLA/UE convention the reference's data is
expressed in — x forward, y right, z up, left-handed, yaw in degrees turning
toward +y — so that the slot map (reference: data_generation/
parking_position.py:30-102) and camera rig (data_generation/world.py:241-317)
constants carry over numerically.

The pixel frame mapping is the reference's ``cam2pixel`` permutation
(world.py:305-309): camera-frame (x fwd, y right, z up) -> (u=y, v=-z,
depth=x), so that K @ (cam2pixel @ X) projects to pixels.

Everything here is pure numpy/jnp; rig matrices are built host-side with
numpy once (the rig is static) and become compile-time constants under jit.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Rigid transforms (CARLA convention)
# ---------------------------------------------------------------------------


def rotation_matrix(roll_deg: float, pitch_deg: float, yaw_deg: float) -> np.ndarray:
    """3x3 rotation in CARLA's Transform.get_matrix convention."""
    cy, sy = math.cos(math.radians(yaw_deg)), math.sin(math.radians(yaw_deg))
    cp, sp = math.cos(math.radians(pitch_deg)), math.sin(math.radians(pitch_deg))
    cr, sr = math.cos(math.radians(roll_deg)), math.sin(math.radians(roll_deg))
    return np.array(
        [
            [cp * cy, cy * sp * sr - sy * cr, -cy * sp * cr - sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, -sy * sp * cr + cy * sr],
            [sp, -cp * sr, cp * cr],
        ],
        dtype=np.float64,
    )


def transform_matrix(x: float, y: float, z: float,
                     roll: float = 0.0, pitch: float = 0.0, yaw: float = 0.0) -> np.ndarray:
    """4x4 local->parent matrix (CARLA Transform.get_matrix equivalent)."""
    mat = np.eye(4, dtype=np.float64)
    mat[:3, :3] = rotation_matrix(roll, pitch, yaw)
    mat[:3, 3] = (x, y, z)
    return mat


def inverse_rigid(mat: np.ndarray) -> np.ndarray:
    """Inverse of a 4x4 rigid transform."""
    inv = np.eye(4, dtype=mat.dtype)
    r = mat[:3, :3].T
    inv[:3, :3] = r
    inv[:3, 3] = -r @ mat[:3, 3]
    return inv


# Camera-frame -> pixel-frame axis permutation (reference world.py:305-309).
CAM2PIXEL = np.array(
    [[0.0, 1.0, 0.0, 0.0],
     [0.0, 0.0, -1.0, 0.0],
     [1.0, 0.0, 0.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]],
    dtype=np.float64,
)

# Surround rig: pose of each camera on the ego vehicle
# (reference: data_generation/world.py:248-288; depth cameras share poses).
CAM_RIG: Dict[str, Dict[str, float]] = {
    "front": {"x": 1.5, "y": 0.0, "z": 1.5, "roll": 0.0, "pitch": 0.0, "yaw": 0.0},
    "left": {"x": 0.0, "y": -0.8, "z": 1.5, "roll": 0.0, "pitch": -40.0, "yaw": -90.0},
    "right": {"x": 0.0, "y": 0.8, "z": 1.5, "roll": 0.0, "pitch": -40.0, "yaw": 90.0},
    "rear": {"x": -2.2, "y": 0.0, "z": 1.5, "roll": 0.0, "pitch": -30.0, "yaw": 180.0},
}
CAM_ORDER = ("front", "left", "right", "rear")  # dataset order: carla_dataset.py:386-389


def camera_intrinsics(width: int = 400, height: int = 300, fov_deg: float = 100.0) -> np.ndarray:
    """Pinhole K for CARLA's camera model (reference world.py:294-303)."""
    f = width / (2.0 * math.tan(math.radians(fov_deg) / 2.0))
    return np.array(
        [[f, 0.0, width / 2.0],
         [0.0, f, height / 2.0],
         [0.0, 0.0, 1.0]],
        dtype=np.float64,
    )


def update_intrinsics(K: np.ndarray, top_crop: float = 0.0, left_crop: float = 0.0,
                      scale_width: float = 1.0, scale_height: float = 1.0) -> np.ndarray:
    """Adjust K for scale+crop (reference dataset/carla_dataset.py:135-146)."""
    K = K.copy()
    K[0, 0] *= scale_width
    K[0, 2] *= scale_width
    K[1, 1] *= scale_height
    K[1, 2] *= scale_height
    K[0, 2] -= left_crop
    K[1, 2] -= top_crop
    return K


def build_rig(image_crop: int = 256, width: int = 400, height: int = 300,
              fov_deg: float = 100.0) -> Tuple[np.ndarray, np.ndarray]:
    """Intrinsics and veh->pixel-cam extrinsics for the 4-camera rig.

    Returns (intrinsics (4,3,3), extrinsics (4,4,4)) float32, in CAM_ORDER,
    with K adjusted for the center crop to ``image_crop`` — the exact model
    inputs the reference dataset emits (carla_dataset.py:181-230).
    """
    top_crop = height // 2 - image_crop // 2
    left_crop = width // 2 - image_crop // 2
    K = update_intrinsics(camera_intrinsics(width, height, fov_deg),
                          top_crop=top_crop, left_crop=left_crop)
    intrinsics = np.stack([K] * len(CAM_ORDER)).astype(np.float32)

    extrinsics = []
    for name in CAM_ORDER:
        spec = CAM_RIG[name]
        cam2veh = transform_matrix(spec["x"], spec["y"], spec["z"],
                                   spec["roll"], spec["pitch"], spec["yaw"])
        veh2cam = CAM2PIXEL @ inverse_rigid(cam2veh)
        extrinsics.append(veh2cam)
    return intrinsics, np.stack(extrinsics).astype(np.float32)


# ---------------------------------------------------------------------------
# Planar pose helpers (sim state lives in SE(2))
# ---------------------------------------------------------------------------


def wrap_angle_deg(a):
    """Wrap degrees to (-180, 180]."""
    return jnp.asarray(a) - 360.0 * jnp.floor((jnp.asarray(a) + 180.0) / 360.0)


def rot2d(yaw_rad):
    """(..., 2, 2) rotation; consistent with x fwd / y right / yaw toward +y."""
    c, s = jnp.cos(yaw_rad), jnp.sin(yaw_rad)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def world_to_ego_xy(points_xy, ego_xy, ego_yaw_rad):
    """World-frame planar points -> ego frame. points (..., 2)."""
    rel = jnp.asarray(points_xy) - jnp.asarray(ego_xy)
    c, s = jnp.cos(ego_yaw_rad), jnp.sin(ego_yaw_rad)
    x = rel[..., 0] * c + rel[..., 1] * s
    y = -rel[..., 0] * s + rel[..., 1] * c
    return jnp.stack([x, y], axis=-1)


def ego_to_world_xy(points_xy, ego_xy, ego_yaw_rad):
    """Ego-frame planar points -> world frame."""
    p = jnp.asarray(points_xy)
    c, s = jnp.cos(ego_yaw_rad), jnp.sin(ego_yaw_rad)
    x = p[..., 0] * c - p[..., 1] * s
    y = p[..., 0] * s + p[..., 1] * c
    return jnp.stack([x, y], axis=-1) + jnp.asarray(ego_xy)


def convert_slot_coord(target_xyyaw, ego_xyyaw):
    """Target slot [x, y, yaw_deg] (world) -> ego frame, yaw wrapped.

    Equivalent to the reference's convert_slot_coord
    (dataset/carla_dataset.py:12-29): planar transform of the position plus a
    wrapped yaw difference.
    """
    target = jnp.asarray(target_xyyaw, jnp.float32)
    ego = jnp.asarray(ego_xyyaw, jnp.float32)
    yaw_rad = jnp.radians(ego[..., 2])
    pos = world_to_ego_xy(target[..., :2], ego[..., :2], yaw_rad)
    dyaw = wrap_angle_deg(target[..., 2] - ego[..., 2])
    return jnp.concatenate([pos, dyaw[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# BEV grid + lift-splat frustum
# ---------------------------------------------------------------------------


def bev_grid_parameters(x_bound, y_bound, z_bound):
    """(resolution, start_position, dimension) per axis — the reference's
    calculate_birds_eye_view_parameters (tool/geometry.py:40-59)."""
    bounds = (x_bound, y_bound, z_bound)
    res = np.array([b[2] for b in bounds], np.float32)
    start = np.array([b[0] + b[2] / 2.0 for b in bounds], np.float32)
    dim = np.array([int(round((b[1] - b[0]) / b[2])) for b in bounds], np.int32)
    return res, start, dim


def create_frustum(final_dim, down_sample: int, d_bound) -> np.ndarray:
    """(D, h, w, 3) grid of (u_px, v_px, depth_m) — the LSS frustum
    (reference: model/bev_model.py:28-43). Host-side constant."""
    H, W = final_dim
    h, w = H // down_sample, W // down_sample
    depths = np.arange(*d_bound, dtype=np.float32)  # (D,)
    D = depths.shape[0]
    xs = np.linspace(0, W - 1, w, dtype=np.float32)
    ys = np.linspace(0, H - 1, h, dtype=np.float32)
    frustum = np.zeros((D, h, w, 3), np.float32)
    frustum[..., 0] = xs[None, None, :]
    frustum[..., 1] = ys[None, :, None]
    frustum[..., 2] = depths[:, None, None]
    return frustum


def frustum_to_ego(frustum: np.ndarray, intrinsics: np.ndarray,
                   extrinsics: np.ndarray) -> np.ndarray:
    """Un-project frustum pixels+depths to ego-frame 3D points.

    frustum (D,h,w,3); intrinsics (N,3,3); extrinsics (N,4,4) veh->pixel-cam.
    Returns (N, D, h, w, 3) ego-frame points (reference: bev_model.py:45-57).
    Host-side numpy: the rig is static, so the geometry (and hence the splat
    pattern) is a compile-time constant.
    """
    cam2veh = np.stack([np.linalg.inv(e.astype(np.float64)) for e in extrinsics])
    rot, trans = cam2veh[:, :3, :3], cam2veh[:, :3, 3]
    # pixel coords scaled by depth: (u*d, v*d, d)
    pts = np.concatenate(
        [frustum[..., :2] * frustum[..., 2:3], frustum[..., 2:3]], axis=-1
    ).astype(np.float64)
    K_inv = np.stack([np.linalg.inv(k.astype(np.float64)) for k in intrinsics])
    combine = np.einsum("nij,njk->nik", rot, K_inv)  # (N,3,3)
    ego = np.einsum("nij,dhwj->ndhwi", combine, pts) + trans[:, None, None, None, :]
    return ego.astype(np.float32)
