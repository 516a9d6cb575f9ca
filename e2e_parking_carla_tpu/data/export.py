"""Export on-device episodes to the reference's on-disk layout.

Writes the directory structure the reference's 10-thread writer produces
(data_generation/data_generator.py:186-292) so episodes generated here load
into the reference's CarlaDataset unchanged:

    {save_path}/{map}/{stamp}/task{i}/
        rgb_{front,left,right,rear}/NNNN.png      400x300 (our 256^2 render
                                                  centered on a black canvas
                                                  so the center-crop matches)
        depth_{...}/NNNN.png                      CARLA 24-bit RGB encoding
        topdown/encoded_NNNN.png                  vehicle bit in the green
                                                  channel (tools.py:9-24 ->
                                                  grayscale 75 after 'L')
        measurements/NNNN.json                    schema of data_generator
                                                  :254-278
        parking_goal/0001.json

Host-side and optional — the on-device pipeline never touches disk.
"""

from __future__ import annotations

import datetime
import json
import os

import numpy as np

from e2e_parking_carla_tpu.config import Config
from e2e_parking_carla_tpu.sim import scene as scene_lib

CAM_DIRS = ("rgb_front", "rgb_left", "rgb_right", "rgb_rear")
DEPTH_DIRS = ("depth_front", "depth_left", "depth_right", "depth_rear")


def _to_canvas(img256: np.ndarray, width=400, height=300) -> np.ndarray:
    """Embed a (256,256,C) image centered in a (300,400,C) canvas."""
    c = img256.shape[-1] if img256.ndim == 3 else 1
    canvas = np.zeros((height, width, c) if c > 1 else (height, width),
                      img256.dtype)
    y0 = height // 2 - img256.shape[0] // 2
    x0 = width // 2 - img256.shape[1] // 2
    canvas[y0:y0 + img256.shape[0], x0:x0 + img256.shape[1]] = img256
    return canvas


def encode_depth_carla(depth_m: np.ndarray) -> np.ndarray:
    """Meters -> CARLA 24-bit RGB depth encoding (inverse of
    carla_dataset.py:114-131 get_depth); uses the native codec when built."""
    from e2e_parking_carla_tpu import native

    return native.depth_encode(depth_m)


def export_episodes(buffer, save_path: str, map_name: str, cfg: Config,
                    render: bool = True) -> str:
    """Write each successful episode in `buffer` to disk. Returns the root."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from e2e_parking_carla_tpu.sim.bev import render_bev_seg
    from e2e_parking_carla_tpu.sim.camera import render_cameras
    from e2e_parking_carla_tpu.sim.env import SceneState

    stamp = datetime.datetime.now().strftime("%m_%d_%H_%M_%S")
    root = os.path.join(save_path, map_name, stamp)
    os.makedirs(root, exist_ok=True)

    success = np.asarray(buffer.success)
    valid = np.asarray(buffer.valid)
    render_fn = jax.jit(
        lambda x, y, yaw, sc, w: render_cameras(x, y, yaw, sc, cfg.sim, w))
    bev_fn = jax.jit(
        lambda x, y, yaw, sc: render_bev_seg(x, y, yaw, sc, cfg.model, cfg.sim))

    task_idx = 0
    for e in range(success.shape[0]):
        if not success[e]:
            continue
        frames = np.where(valid[e])[0]
        if len(frames) == 0:
            continue
        # save the full prefix (the reference saves every buffered frame)
        last = frames.max() + cfg.model.future_frame_nums + 1
        task_dir = os.path.join(root, f"task{task_idx}")
        for d in (*CAM_DIRS, *DEPTH_DIRS, "measurements", "parking_goal",
                  "topdown", "lidar"):
            os.makedirs(os.path.join(task_dir, d), exist_ok=True)

        scene = SceneState(
            npc_valid=buffer.npc_valid[e], npc_yaw=buffer.npc_yaw[e],
            goal_free=~buffer.npc_valid[e], target_idx=buffer.target_idx[e])
        target_xy = scene_lib.SLOT_XY[int(buffer.target_idx[e])]
        with open(os.path.join(task_dir, "parking_goal", "0001.json"), "w") as f:
            json.dump({"x": float(target_xy[0]), "y": float(target_xy[1]),
                       "yaw": float(scene_lib.SLOT_YAW_DEG)}, f, indent=4)

        for t in range(int(last)):
            x = float(buffer.ego_x[e, t])
            y = float(buffer.ego_y[e, t])
            yaw = float(buffer.ego_yaw[e, t])
            if render:
                cams = render_fn(jnp.float32(x), jnp.float32(y),
                                 jnp.float32(yaw), scene, buffer.weather[e])
                rgb = np.asarray(cams["rgb"])
                depth = np.asarray(cams["depth"])
                for i, (cd, dd) in enumerate(zip(CAM_DIRS, DEPTH_DIRS)):
                    img = (_to_canvas((rgb[i] * 255).astype(np.uint8)))
                    Image.fromarray(img).save(
                        os.path.join(task_dir, cd, f"{t:04d}.png"))
                    dimg = _to_canvas(encode_depth_carla(depth[i]))
                    Image.fromarray(dimg).save(
                        os.path.join(task_dir, dd, f"{t:04d}.png"))
                seg = np.asarray(bev_fn(jnp.float32(x), jnp.float32(y),
                                        jnp.float32(yaw), scene))
                # vehicle bit -> green 128 so 'L'-conversion lands on 75;
                # 400x400 raw that scale-0.5 crops back to our 200 grid
                topdown = np.zeros((400, 400, 3), np.uint8)
                veh = np.kron((seg == 1).astype(np.uint8), np.ones((2, 2), np.uint8))
                # un-flip: dataset applies [::-1] after cropping
                topdown[..., 1] = veh[::-1] * 128
                Image.fromarray(topdown).save(
                    os.path.join(task_dir, "topdown", f"encoded_{t:04d}.png"))

            measurements = {
                "x": x, "y": y, "z": 0.32,
                "pitch": 0.0, "yaw": float(np.degrees(yaw)), "roll": 0.0,
                "speed": float(buffer.speed[e, t]),
                "Throttle": float(buffer.throttle[e, t]),
                "Steer": float(buffer.steer[e, t]),
                "Brake": float(buffer.brake[e, t]),
                "Reverse": bool(buffer.reverse[e, t]),
                "Hand brake": False, "Manual": False,
                "Gear": "R" if bool(buffer.reverse[e, t]) else 1,
                "acc_x": float(buffer.acc_x[e, t]),
                "acc_y": float(buffer.acc_y[e, t]),
                "acc_z": 9.81, "gyr_x": 0.0, "gyr_y": 0.0, "gyr_z": 0.0,
                "compass": 0.0, "lat": 0.0, "lon": 0.0,
            }
            with open(os.path.join(task_dir, "measurements", f"{t:04d}.json"),
                      "w") as f:
                json.dump(measurements, f, indent=4)
        task_idx += 1
    return root
