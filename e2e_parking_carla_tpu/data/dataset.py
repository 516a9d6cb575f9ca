"""Reader for the reference's on-disk episode format.

A torch-free re-implementation of the reference CarlaDataset
(dataset/carla_dataset.py:155-423): walks `{data_dir}/{map}/` task
directories, indexes every usable frame, and yields the same 11-tensor
training dicts as numpy arrays (channels-last). Lets users with existing
CARLA-recorded datasets train this framework on them directly; the on-device
rollout pipeline (data/rollout.py) is the primary path and needs no files.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np

from e2e_parking_carla_tpu import geometry as geo
from e2e_parking_carla_tpu.config import ModelConfig

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CAMS = ("front", "left", "right", "rear")


def scale_and_crop(img: np.ndarray, crop: int) -> np.ndarray:
    """Center-crop (reference carla_dataset.py:47-63, scale=1)."""
    h, w = img.shape[:2]
    y0, x0 = h // 2 - crop // 2, w // 2 - crop // 2
    return img[y0:y0 + crop, x0:x0 + crop].copy()


def decode_depth(img_rgb: np.ndarray) -> np.ndarray:
    """CARLA 24-bit RGB depth -> meters (carla_dataset.py:114-131); uses the
    native codec when built."""
    from e2e_parking_carla_tpu import native

    return native.depth_decode(img_rgb)


def _tokenize_scalar(throttle, brake, steer, reverse, token_nums=204):
    # float32 arithmetic to match the on-device tokenizer bit-for-bit
    # (boundary values like throttle=0.7 round differently in f64)
    valid = token_nums - 4
    half = np.float32(valid / 2)
    throttle, brake, steer = np.float32(throttle), np.float32(brake), np.float32(steer)
    if brake != 0.0:
        tb = int(half * (np.float32(1) - brake))
    else:
        tb = int(half * (throttle + np.float32(1)))
    return [tb, int((steer + np.float32(1)) * half), int(reverse) * valid]


class CarlaEpisodeDataset:
    """Indexes reference-format episodes; `__getitem__` returns the training
    dict (numpy, channels-last)."""

    def __init__(self, root_dir: str, cfg: Optional[ModelConfig] = None):
        self.cfg = cfg or ModelConfig()
        self.samples: List[dict] = []
        self._index(root_dir)

    def _index(self, root_dir: str):
        cfg = self.cfg
        task_paths = []
        for run_dir in sorted(os.listdir(root_dir)):
            run_path = os.path.join(root_dir, run_dir)
            if not os.path.isdir(run_path):
                continue
            for task_dir in sorted(os.listdir(run_path)):
                task_path = os.path.join(run_path, task_dir)
                if os.path.isdir(os.path.join(task_path, "measurements")):
                    task_paths.append(task_path)
        for task_path in task_paths:
            n = len(os.listdir(os.path.join(task_path, "measurements")))
            for frame in range(cfg.hist_frame_nums, n - cfg.future_frame_nums):
                self.samples.append({"task": task_path, "frame": frame})

    def __len__(self):
        return len(self.samples)

    def _measurement(self, task: str, frame: int) -> dict:
        with open(os.path.join(task, "measurements", f"{frame:04d}.json")) as f:
            return json.load(f)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        from PIL import Image

        cfg = self.cfg
        rec = self.samples[idx]
        task, frame = rec["task"], rec["frame"]
        name = f"{frame:04d}.png"

        from e2e_parking_carla_tpu import native

        images, depths = [], []
        for cam in CAMS:
            rgb = np.asarray(Image.open(
                os.path.join(task, f"rgb_{cam}", name)).convert("RGB"))
            images.append(native.normalize_crop(rgb, cfg.image_crop))
            dimg = np.asarray(Image.open(
                os.path.join(task, f"depth_{cam}", name)).convert("RGB"))
            depths.append(decode_depth(scale_and_crop(dimg, cfg.image_crop)))

        m = self._measurement(task, frame)
        ego_xyyaw = np.array([m["x"], m["y"], m["yaw"]], np.float32)

        with open(os.path.join(task, "parking_goal", "0001.json")) as f:
            goal = json.load(f)
        target_point = np.asarray(geo.convert_slot_coord(
            np.array([goal["x"], goal["y"], goal["yaw"]], np.float32), ego_xyyaw))

        # future controls
        frames_tok, accs, steers, revs = [], [], [], []
        for i in range(cfg.future_frame_nums):
            fm = self._measurement(task, frame + 1 + i)
            frames_tok.append(_tokenize_scalar(
                fm["Throttle"], fm["Brake"], fm["Steer"], fm["Reverse"],
                cfg.token_nums))
            accs.append(-fm["Brake"] if fm["Brake"] != 0.0 else fm["Throttle"])
            steers.append(fm["Steer"])
            revs.append(int(fm["Reverse"]))
        seq = [cfg.bos_token]
        for t3 in frames_tok:
            seq.extend(t3)
        seq.extend([cfg.eos_token, cfg.pad_token])

        # BEV semantic GT
        top = Image.open(os.path.join(task, "topdown", f"encoded_{name}")).convert("L")
        top = np.asarray(top.resize((top.width // 2, top.height // 2),
                                    resample=Image.NEAREST))
        top = scale_and_crop(top, 200)
        seg = np.zeros_like(top, np.int64)
        seg[top == 75] = 1
        seg = seg[::-1].copy()  # LSS: +x up (carla_dataset.py:458-460)
        # stamp the target slot (ProcessSemantic.draw_target_slot equivalent)
        res = cfg.bev_x_bound[2]
        rows = np.arange(200)[:, None]
        cols = np.arange(200)[None, :]
        cx = (rows + 0.5 - 100) * res
        cy = (cols + 0.5 - 100) * res
        yaw_r = np.radians(target_point[2])
        lx = (cx - target_point[0]) * np.cos(yaw_r) + (cy - target_point[1]) * np.sin(yaw_r)
        ly = -(cx - target_point[0]) * np.sin(yaw_r) + (cy - target_point[1]) * np.cos(yaw_r)
        seg[(np.abs(lx) <= 2.75) & (np.abs(ly) <= 1.55)] = 2

        return {
            "images": np.stack(images).astype(np.float32),
            "depth": np.stack(depths).astype(np.float32),
            "segmentation": seg.astype(np.int32),
            "ego_motion": np.array([[m["speed"], m["acc_x"], m["acc_y"]]], np.float32),
            "target_point": target_point.astype(np.float32),
            "gt_control": np.array(seq, np.int32),
            "gt_acc": np.array(accs, np.float32),
            "gt_steer": np.array(steers, np.float32),
            "gt_reverse": np.array(revs, np.int32),
        }

    def batches(self, batch_size: int, shuffle: bool = True,
                seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Simple host-side batch iterator (stacks `__getitem__` dicts)."""
        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(i)] for i in order[start:start + batch_size]]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
