"""Surround-view camera renderer: 4x RGB + depth + semantics from scene state.

Replaces CARLA's UE4 sensor rendering (the reference spawns 4 RGB + 4 depth
cameras at 400x300 fov-100 and center-crops to 256, data_generation/
world.py:241-317 + dataset/carla_dataset.py:47-63). We render the cropped
256x256 frame directly with the crop-adjusted intrinsics.

Design (TPU-first):
* Per-pixel ray directions in the VEHICLE frame are host-precomputed
  constants (the rig is static); at runtime only a planar rotation by the
  ego yaw is applied. Rays are scaled so the camera-forward component is 1,
  making the ray parameter t equal CARLA's plane depth.
* The static lot (asphalt + slot line markings) is baked once into a
  world-frame ground texture; rendering samples it bilinearly — a gather,
  no per-pixel geometry for the static world.
* Parked vehicles are analytic boxes; a `lax.scan` over the 64 slots keeps a
  running nearest-hit (t, slot id, face) without materializing a
  pixels-by-boxes tensor. (ops/render.py provides a fused Pallas kernel for
  the same math; this module is the readable reference implementation.)
* Output: rgb float32 [0,1] (N,H,W,3), depth meters (N,H,W), semantic ids
  (N,H,W) int32 (0 ground, 1 vehicle, 2 target-slot ground).

Visual fidelity target is "sufficient for the policy", not UE4 parity
(BASELINE.json north star); the red target marking mirrors the 'T' CARLA
draws on the goal slot (world.py:479-519).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from e2e_parking_carla_tpu.config import SimConfig
from e2e_parking_carla_tpu import geometry as geo
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.env import SceneState

SKY_DEPTH = 1000.0  # CARLA depth cameras saturate at 1 km
VEHICLE_HALF_HEIGHT = 0.75
# Distance LOD: vehicles whose center is further than this from a camera
# are not drawn (shared spec of BOTH renderers — the analog of CARLA's
# actor draw distance; bev_render.py walks actors within 50 m). Keeping it
# a shared rule lets the Pallas candidate selection use it as a hard cull
# while preserving bitwise parity with this renderer.
LOD_RADIUS = 45.0
CAM_NAMES = geo.CAM_ORDER

LINE_HALF_WIDTH = 0.08


@functools.lru_cache(maxsize=4)
def camera_rays(sim_cfg: SimConfig = SimConfig()):
    """Host-side constants: per-pixel ray directions in the vehicle frame,
    scaled to unit camera-forward component, plus camera origins.

    Returns (dirs (N,H,W,3) f32, origins (N,3) f32).
    """
    H, W = sim_cfg.cam_height, sim_cfg.cam_width
    f = sim_cfg.focal
    cx, cy = W / 2.0, H / 2.0
    u = (np.arange(W, dtype=np.float64) + 0.5 - cx) / f
    v = (np.arange(H, dtype=np.float64) + 0.5 - cy) / f
    # camera frame (x fwd, y right, z up): d = (1, u, -v)
    d_cam = np.zeros((H, W, 3))
    d_cam[..., 0] = 1.0
    d_cam[..., 1] = u[None, :]
    d_cam[..., 2] = -v[:, None]

    dirs, origins = [], []
    for name in CAM_NAMES:
        spec = geo.CAM_RIG[name]
        R = geo.rotation_matrix(spec["roll"], spec["pitch"], spec["yaw"])
        dirs.append(np.einsum("ij,hwj->hwi", R, d_cam))
        origins.append([spec["x"], spec["y"], spec["z"]])
    return np.stack(dirs).astype(np.float32), np.array(origins, np.float32)


@functools.lru_cache(maxsize=4)
def static_ray_tables(sim_cfg: SimConfig = SimConfig()):
    """Pose-independent per-pixel render constants, precomputed once on the
    host and shared by BOTH renderers (sim/camera.py and ops/render.py).

    Because the camera rig is rigid and the ground/box-height planes are
    horizontal, several per-pixel quantities do not depend on the vehicle
    pose at all: the ground-intersection distance along each ray, the sky
    elevation factor, and the z-slab interval of every vehicle box (all
    boxes share one height). Hoisting them here removes divisions/rsqrts
    from the per-frame hot path — and having one table be the single source
    of truth keeps the fused Pallas kernel bit-identical to the pure
    renderer (bench.py's hardware correctness gate).

    Returns a dict of float32 (N, H, W) arrays:
      dx, dy, dz : ray direction (vehicle frame, unit forward component)
      tg         : ground-plane hit distance, SKY_DEPTH where the ray
                   never hits the ground
      elev       : clip(d_z / |d|, 0, 1) — sky gradient factor
      zn, zf     : near/far parameter of the vehicle-height z-slab
    plus 'origins' (N, 3): camera positions in the vehicle frame.
    """
    dirs, origins = camera_rays(sim_cfg)  # f32 (N,H,W,3), (N,3)
    dx = dirs[..., 0]
    dy = dirs[..., 1]
    dz = dirs[..., 2]
    oz = origins[:, 2][:, None, None].astype(np.float32)
    eps = np.float32(1e-8)
    safe_dz = np.where(np.abs(dz) < eps,
                       np.where(dz >= 0, eps, -eps), dz).astype(np.float32)
    tg = (-oz / safe_dz).astype(np.float32)
    ground_hit = (dz < -1e-6) & (tg > 0)
    tg = np.where(ground_hit, tg, np.float32(SKY_DEPTH)).astype(np.float32)

    norm = np.sqrt(dx * dx + dy * dy + dz * dz).astype(np.float32)
    elev = np.clip(dz / norm, 0.0, 1.0).astype(np.float32)

    hh = np.float32(VEHICLE_HALF_HEIGHT)
    o2 = (oz - hh).astype(np.float32)  # ray origin in box z frame
    inv = (np.float32(1.0) / safe_dz).astype(np.float32)
    t1 = (-hh - o2) * inv
    t2 = (hh - o2) * inv
    zn = np.minimum(t1, t2).astype(np.float32)
    zf = np.maximum(t1, t2).astype(np.float32)
    return {"dx": dx, "dy": dy, "dz": dz, "tg": tg, "elev": elev,
            "zn": zn, "zf": zf, "origins": origins}


def ground_line_intensity(px, py):
    """Analytic slot-line-marking intensity at world ground points (...,).

    White outlines around each slot rectangle — the same geometry the
    reference's OpenDRIVE MapImage rasterizes (bev_render.py:686-843) —
    computed in closed form so the Pallas kernel and the pure-JAX renderer
    share one definition. Exploits the lot structure: 4 slot rows at fixed
    x, 16 slot centers in y per row; the nearest row/center is found with a
    handful of compares, no texture memory.
    """
    px = jnp.asarray(px)
    py = jnp.asarray(py)
    hl, hw = 2.75, 1.55  # slot rectangle half extents (slot axis = world x)
    w = LINE_HALF_WIDTH

    row_x = jnp.asarray(scene_lib.ROW_X)  # (4,)
    slot_y = jnp.asarray(scene_lib.SLOT_Y)  # (16,)
    # distance to the nearest row line / slot center
    dx_row = jnp.min(jnp.abs(px[..., None] - row_x), axis=-1)
    dy_slot = jnp.min(jnp.abs(py[..., None] - slot_y), axis=-1)

    # x-edges: two lines at row_x +- hl, spanning the slot's y extent
    on_x_edge = (jnp.abs(dx_row - hl) < w) & (dy_slot < hw + w)
    # y-edges: lines at slot_y +- hw, spanning the slot's x extent
    on_y_edge = (jnp.abs(dy_slot - hw) < w) & (dx_row < hl + w)
    return (on_x_edge | on_y_edge).astype(jnp.float32)


def _vehicle_palette() -> np.ndarray:
    """(S, 3) deterministic car colors."""
    rng = np.random.RandomState(1234)
    base = np.array(
        [[0.7, 0.7, 0.72], [0.1, 0.1, 0.12], [0.55, 0.06, 0.06],
         [0.12, 0.2, 0.45], [0.8, 0.78, 0.75], [0.35, 0.35, 0.38],
         [0.1, 0.3, 0.15], [0.6, 0.45, 0.15]],
        np.float32,
    )
    idx = rng.randint(0, len(base), scene_lib.NUM_SLOTS)
    jitter = rng.uniform(-0.05, 0.05, (scene_lib.NUM_SLOTS, 3)).astype(np.float32)
    return np.clip(base[idx] + jitter, 0.0, 1.0)


# weather presets: (brightness, sky RGB) — a coarse stand-in for the
# reference's carla.WeatherParameters cycling (world.py:21-23,360-365)
WEATHER_TABLE = np.array(
    [
        [1.00, 0.55, 0.70, 0.95],  # ClearNoon
        [0.90, 0.60, 0.68, 0.85],  # CloudyNoon
        [0.80, 0.55, 0.60, 0.70],  # WetNoon
        [0.70, 0.50, 0.52, 0.58],  # WetCloudyNoon
        [0.60, 0.45, 0.46, 0.50],  # MidRainyNoon
        [0.55, 0.42, 0.42, 0.46],  # HardRainNoon
        [0.75, 0.52, 0.56, 0.62],  # SoftRainNoon
        [0.85, 0.80, 0.62, 0.55],  # ClearSunset
        [0.75, 0.70, 0.58, 0.52],  # CloudySunset
        [0.65, 0.60, 0.52, 0.48],  # WetSunset
        [0.60, 0.55, 0.48, 0.45],  # WetCloudySunset
        [0.50, 0.46, 0.42, 0.40],  # MidRainSunset
        [0.45, 0.42, 0.38, 0.38],  # HardRainSunset
        [0.65, 0.55, 0.48, 0.44],  # SoftRainSunset
    ],
    np.float32,
)


def _safe_div(a, b, eps=1e-8):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b >= 0, eps, -eps), b)


def render_cameras(ego_x, ego_y, ego_yaw, scene: SceneState,
                   sim_cfg: SimConfig, weather=0):
    """Render the 4-camera surround rig for one env state.

    Returns dict with 'rgb' (N,H,W,3) f32 in [0,1], 'depth' (N,H,W) f32
    meters (camera-plane depth, CARLA convention), 'sem' (N,H,W) i32.
    vmap over a batch of envs.
    """
    tab = static_ray_tables(sim_cfg)
    origins_veh = jnp.asarray(tab["origins"])

    # vehicle -> world: rotate by ego yaw about z, translate
    c, s = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
    dx, dy, dz = (jnp.asarray(tab["dx"]), jnp.asarray(tab["dy"]),
                  jnp.asarray(tab["dz"]))
    d_world = jnp.stack([dx * c - dy * s, dx * s + dy * c,
                         jnp.broadcast_to(dz, dx.shape)], axis=-1)  # (N,H,W,3)
    ox = origins_veh[:, 0] * c - origins_veh[:, 1] * s + ego_x
    oy = origins_veh[:, 0] * s + origins_veh[:, 1] * c + ego_y
    o_world = jnp.stack([ox, oy, origins_veh[:, 2]], axis=-1)  # (N,3)
    o_world = o_world[:, None, None, :]  # (N,1,1,3)

    # ---- ground plane (static per pixel: the rig is rigid) ----
    t_ground = jnp.asarray(tab["tg"])

    # ---- vehicle boxes: scan over slots keeping the nearest hit ----
    slot_xy = jnp.asarray(scene_lib.SLOT_XY)
    half = jnp.array(
        [sim_cfg.npc_half_length, sim_cfg.npc_half_width, VEHICLE_HALF_HEIGHT],
        jnp.float32,
    )

    # the z slab is the same for every box (one height, no roll/pitch):
    # its near/far parameters are static per pixel
    zn = jnp.asarray(tab["zn"])
    zf = jnp.asarray(tab["zf"])

    # ---- distance LOD (shared renderer spec) ----
    # Vehicles whose center sits further than LOD_RADIUS from a camera are
    # not drawn by that camera. Computed in the VEHICLE frame with exactly
    # the op order of the Pallas selection tests (ops/render.py) so the
    # draw/skip decision is bitwise identical between the two renderers.
    origins_xy = origins_veh[:, :2]  # (N, 2) vehicle frame

    def lod_keep(center_xy):
        rx = center_xy[0] - ego_x
        ry = center_xy[1] - ego_y
        relv_x = rx * c + ry * s  # R(-yaw)
        relv_y = -rx * s + ry * c
        relc_x = relv_x - origins_xy[:, 0]  # (N,)
        relc_y = relv_y - origins_xy[:, 1]
        d2 = relc_x * relc_x + relc_y * relc_y
        return d2 < LOD_RADIUS ** 2  # (N,) per camera

    def box_step(carry, inp):
        t_best, id_best, face_best = carry
        center_xy, yaw, valid, idx = inp
        valid = valid & lod_keep(center_xy)[:, None, None]  # (N,1,1)
        cb, sb = jnp.cos(yaw), jnp.sin(yaw)
        # ray into the box frame (box center at z = half height)
        rel = o_world[..., :2] - jnp.stack([center_xy[0], center_xy[1]])
        o_loc = jnp.stack(
            [rel[..., 0] * cb + rel[..., 1] * sb,
             -rel[..., 0] * sb + rel[..., 1] * cb], axis=-1)
        d_loc = jnp.stack(
            [d_world[..., 0] * cb + d_world[..., 1] * sb,
             -d_world[..., 0] * sb + d_world[..., 1] * cb], axis=-1)
        inv_d = _safe_div(jnp.float32(1.0), d_loc)
        t1 = (-half[:2] - o_loc) * inv_d
        t2 = (half[:2] - o_loc) * inv_d
        t_near = jnp.concatenate(
            [jnp.minimum(t1, t2),
             jnp.broadcast_to(zn, t1.shape[:-1])[..., None]], axis=-1)
        t_far = jnp.concatenate(
            [jnp.maximum(t1, t2),
             jnp.broadcast_to(zf, t1.shape[:-1])[..., None]], axis=-1)
        tmin = jnp.max(t_near, axis=-1)
        tmax = jnp.min(t_far, axis=-1)
        hit = valid & (tmax >= tmin) & (tmax > 0) & (tmin > 0) & (tmin < t_best)
        face = jnp.argmax(t_near, axis=-1)  # which slab bounds entry
        t_best = jnp.where(hit, tmin, t_best)
        id_best = jnp.where(hit, idx, id_best)
        face_best = jnp.where(hit, face, face_best)
        return (t_best, id_best, face_best), None

    # Derive the carry init from d_world (`*0` keeps the data dependence)
    # instead of building constants: under shard_map with the varying-axis
    # checker on, a constant init is "unvarying" while the body output
    # varies over the data axis, and the scan is rejected. The multiply
    # fuses away; d_world is finite by construction so x*0 == 0 exactly.
    zero = d_world[..., 0] * 0  # (N, H, W), same varying axes as the rays
    init = (
        zero + SKY_DEPTH,
        zero.astype(jnp.int32) - 1,
        zero.astype(jnp.int32),
    )
    (t_box, box_id, box_face), _ = jax.lax.scan(
        box_step,
        init,
        (slot_xy, scene.npc_yaw, scene.npc_valid,
         jnp.arange(scene_lib.NUM_SLOTS, dtype=jnp.int32)),
    )

    # ---- composite ----
    box_in_front = t_box < t_ground
    t_hit = jnp.where(box_in_front, t_box, t_ground)
    is_sky = t_hit >= SKY_DEPTH

    # ground shading: analytic slot-line markings + target tint
    pg = o_world[..., :2] + t_ground[..., None] * d_world[..., :2]  # (N,H,W,2)
    line = ground_line_intensity(pg[..., 0], pg[..., 1])
    # target slot tint (the red marking CARLA draws on the goal)
    target_xy = slot_xy[scene.target_idx]
    trel_x = pg[..., 0] - target_xy[0]
    trel_y = pg[..., 1] - target_xy[1]
    in_target = (jnp.abs(trel_x) <= sim_cfg.slot_half_length) & (
        jnp.abs(trel_y) <= sim_cfg.slot_half_width)

    asphalt = jnp.float32(0.32)
    ground_gray = asphalt + 0.55 * line
    ground_rgb = jnp.stack([ground_gray, ground_gray, ground_gray], axis=-1)
    target_rgb = jnp.stack(
        [ground_gray * 0.4 + 0.55, ground_gray * 0.4, ground_gray * 0.4], axis=-1)
    ground_rgb = jnp.where(in_target[..., None], target_rgb, ground_rgb)

    # vehicle shading: palette color x per-face lambert-ish factor
    palette = jnp.asarray(_vehicle_palette())
    veh_base = palette[jnp.clip(box_id, 0, None)]  # (N,H,W,3)
    face_light = jnp.asarray([0.75, 0.9, 1.0], jnp.float32)  # x/y/z faces
    veh_rgb = veh_base * face_light[box_face][..., None]

    # sky: elevation gradient, weather tinted (elevation is pose-independent
    # because the rig only yaws about z)
    weather_row = jnp.asarray(WEATHER_TABLE)[jnp.asarray(weather) % len(WEATHER_TABLE)]
    brightness, sky_rgb = weather_row[0], weather_row[1:]
    # factored fma form — matches ops/render.py's elev_a/elev_b static
    # planes bit-for-bit (algebraically = horizon*(1-e) + sky_rgb*e with
    # horizon = sky_rgb*0.8 + 0.18, but the PALLAS kernel evaluates this
    # factored expression, so the pure renderer must round identically)
    elev = jnp.asarray(tab["elev"])[..., None]
    sky = sky_rgb * (0.8 + 0.2 * elev) + 0.18 * (1.0 - elev)

    rgb = jnp.where(
        is_sky[..., None], sky,
        jnp.where(box_in_front[..., None], veh_rgb, ground_rgb))
    rgb = jnp.clip(rgb * brightness, 0.0, 1.0)
    # 8-bit quantization: the reference trains from PNG-decoded uint8 frames
    # (carla_dataset.py:494-515), and the Pallas renderer packs RGB into one
    # int32 plane (ops/render.py) — same rounding keeps the two bit-identical
    rgb = jnp.round(rgb * 255.0) / 255.0

    sem = jnp.where(
        is_sky, 0,
        jnp.where(box_in_front, 1, jnp.where(in_target, 2, 0)))

    return {
        "rgb": rgb,
        "depth": jnp.clip(t_hit, 0.0, SKY_DEPTH),
        "sem": sem.astype(jnp.int32),
    }
