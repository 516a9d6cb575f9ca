"""Host-side visualization: camera grids, BEV panels, attention maps,
episode GIFs.

Replaces the reference's pygame/OpenCV UI stack — the live HUD
(data_generation/hud.py), the spectator CameraManager + episode videos
(data_generation/sensors.py:40-135), and the agent's camera/BEV/attention
panels (agent/parking_agent.py:94-184,543-597) — with PIL-based offline
renderers. Strictly off the hot path: everything here takes numpy arrays.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

SEG_PALETTE = np.array(
    [[40, 40, 40], [200, 200, 60], [220, 60, 60]], np.uint8)


def to_uint8(img) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    return img


def camera_grid(rgb) -> np.ndarray:
    """(4, H, W, 3) float or uint8 -> 2x2 grid (front|left / rear|right)."""
    rgb = to_uint8(rgb)
    row1 = np.concatenate([rgb[0], rgb[1]], axis=1)
    row2 = np.concatenate([rgb[3], rgb[2]], axis=1)
    return np.concatenate([row1, row2], axis=0)


def bev_panel(seg, upscale: int = 2) -> np.ndarray:
    """(X, Y) class ids -> colorized top-down (forward = up)."""
    img = SEG_PALETTE[np.asarray(seg)]
    img = img[::-1]  # +x (forward) points up
    if upscale > 1:
        img = np.kron(img, np.ones((upscale, upscale, 1), np.uint8))
    return img


def attention_panel(attn, out_size: int = 256) -> np.ndarray:
    """Mean-head encoder self-attention (..., L, L) -> heat image.

    The reference averages the last encoder layer's attention over heads and
    queries and reshapes the 256 key weights to 16x16
    (parking_agent.py:94-184)."""
    from PIL import Image

    attn = np.asarray(attn, np.float32)
    while attn.ndim > 2:
        attn = attn.mean(axis=0)
    weights = attn.mean(axis=0)  # (L,) attention received per token
    side = int(np.sqrt(weights.shape[0]))
    heat = weights[: side * side].reshape(side, side)
    heat = (heat - heat.min()) / max(heat.max() - heat.min(), 1e-8)
    img = np.zeros((side, side, 3), np.float32)
    img[..., 0] = heat
    img[..., 2] = 1.0 - heat
    pil = Image.fromarray((img * 255).astype(np.uint8))
    return np.asarray(pil.resize((out_size, out_size), Image.BILINEAR))


def compose_frame(rgb, seg=None, attn=None) -> np.ndarray:
    """One replay frame: camera grid with optional BEV / attention strip."""
    grid = camera_grid(rgb)
    panels = []
    if seg is not None:
        panels.append(bev_panel(seg, upscale=max(1, grid.shape[0] // (2 * np.asarray(seg).shape[0]))))
    if attn is not None:
        panels.append(attention_panel(attn, out_size=grid.shape[0]))
    if panels:
        strip = np.concatenate(
            [_fit_height(p, grid.shape[0]) for p in panels], axis=1)
        grid = np.concatenate([grid, strip], axis=1)
    return grid


def _fit_height(img: np.ndarray, h: int) -> np.ndarray:
    from PIL import Image

    if img.shape[0] == h:
        return img
    w = int(img.shape[1] * h / img.shape[0])
    return np.asarray(Image.fromarray(img).resize((w, h), Image.NEAREST))


def save_gif(frames: List[np.ndarray], path: str, fps: int = 10) -> str:
    """Episode video (the reference writes .avi via CameraManager,
    sensors.py:126-135; a GIF needs no codec stack)."""
    from PIL import Image

    imgs = [Image.fromarray(to_uint8(f)) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return path


def log_prediction_panel(model, state, batch, model_cfg, out_dir: str,
                         step: int, n_samples: int = 2) -> str:
    """Periodic training-artifact image: GT vs predicted BEV segmentation and
    depth for a few validation samples (the reference's matplotlib->
    TensorBoard seg/depth figure loggers, trainer/pl_trainer.py:123-168).

    Writes `{out_dir}/pred_step{step}.png`; returns the path.
    """
    import os

    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    sub = {k: v[:n_samples] for k, v in batch.items()}
    _, seg_logits, depth_logits = model.apply(
        {"params": state.ema_params, "batch_stats": state.batch_stats},
        sub["images"], sub["ego_motion"], sub["target_point"],
        sub["gt_control"], train=False)
    seg_pred = np.asarray(seg_logits).argmax(-1)  # (n, X, Y)
    seg_gt = np.asarray(sub["segmentation"])
    # depth: bin argmax -> meters -> grayscale against d_bound range
    d0, d1, dd = model_cfg.d_bound
    depth_m = d0 + dd * np.asarray(depth_logits).argmax(-1)  # (n, N, h, w)
    rows = []
    for i in range(seg_pred.shape[0]):
        gt_img = bev_panel(seg_gt[i])
        pred_img = bev_panel(seg_pred[i])
        # invert the ImageNet normalization for display
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        front = to_uint8(np.asarray(sub["images"][i, 0]) * std + mean)
        d = np.clip((depth_m[i, 0] - d0) / (d1 - d0), 0, 1)
        d_img = np.repeat(to_uint8(d)[..., None], 3, axis=-1)
        h = gt_img.shape[0]
        row = np.concatenate(
            [_fit_height(p, h) for p in (front, d_img, gt_img, pred_img)], axis=1)
        rows.append(row)
    w = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0))) for r in rows]
    panel = np.concatenate(rows, axis=0)
    path = os.path.join(out_dir, f"pred_step{step}.png")
    Image.fromarray(panel).save(path)
    return path


def replay_episode(buffer, episode: int, cfg, path: str,
                   stride: int = 3, max_frames: Optional[int] = 80) -> str:
    """Render a stored EpisodeBuffer episode to a GIF (camera grid + BEV)."""
    import jax

    from e2e_parking_carla_tpu.ops.dispatch import render_batch
    from e2e_parking_carla_tpu.sim.bev import render_bev_seg
    from e2e_parking_carla_tpu.sim.env import SceneState

    valid = np.asarray(buffer.valid[episode])
    idx = np.where(valid)[0]
    end = (idx.max() + cfg.model.future_frame_nums + 1) if len(idx) else buffer.num_frames
    ts = list(range(0, int(end), stride))
    if max_frames:
        ts = ts[:max_frames]

    scene = SceneState(
        npc_valid=buffer.npc_valid[episode], npc_yaw=buffer.npc_yaw[episode],
        goal_free=~buffer.npc_valid[episode], target_idx=buffer.target_idx[episode])
    bev_fn = jax.jit(lambda x, y, yaw: render_bev_seg(
        x, y, yaw, scene, cfg.model, cfg.sim))

    frames = []
    for t in ts:
        x = buffer.ego_x[episode, t]
        y = buffer.ego_y[episode, t]
        yaw = buffer.ego_yaw[episode, t]
        cams = render_batch(x[None], y[None], yaw[None],
                            jax.tree.map(lambda a: a[None], scene), cfg.sim,
                            buffer.weather[episode][None])
        seg = bev_fn(x, y, yaw)
        frames.append(compose_frame(np.asarray(cams["rgb"][0]), np.asarray(seg)))
    return save_gif(frames, path)
