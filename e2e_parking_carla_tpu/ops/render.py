"""Fused Pallas surround-camera renderer.

The pure-JAX renderer (sim/camera.py) scans over 64 vehicle boxes with the
per-pixel nearest-hit carry living in HBM — ~64 round trips over megabytes
of carry per frame, HBM-bound. This kernel fuses the whole render per pixel
tile in VMEM:

* pixel rays (vehicle frame) are static planes laid out (P/128, 128),
* one grid cell = (env, pixel-tile); the box loop runs inside the kernel
  with the nearest-hit state in registers/VMEM — the carry never leaves
  the chip,
* one pixel tile = one camera, and boxes are pre-culled per (env, camera)
  to the K nearest slots in front of that camera (a masked top_k outside
  the kernel), passed as scalars in SMEM,
* ground slot-line markings are computed analytically (the same closed form
  as sim/camera.py: 4 row lines + 16 slot-center lines), no texture gathers.

Outputs match render_cameras() bit-for-bit in structure: rgb [0,1], plane
depth (meters), semantic ids.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from e2e_parking_carla_tpu.config import SimConfig
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim import camera as cam_lib

LANES = 128
BOX_FIELDS = 8  # cx, cy, cos, sin, r, g, b, valid
ENV_FIELDS = 16


def _ray_planes(sim_cfg: SimConfig):
    """Static pixel-ray planes: 6 arrays of shape (P/128, 128)."""
    dirs, origins = cam_lib.camera_rays(sim_cfg)  # (4,H,W,3), (4,3)
    N, H, W, _ = dirs.shape
    P = N * H * W
    assert P % LANES == 0
    flat_dirs = dirs.reshape(P, 3)
    flat_orig = np.repeat(origins, H * W, axis=0)  # (P, 3)
    rows = P // LANES
    return tuple(
        a.reshape(rows, LANES).astype(np.float32)
        for a in (flat_dirs[:, 0], flat_dirs[:, 1], flat_dirs[:, 2],
                  flat_orig[:, 0], flat_orig[:, 1], flat_orig[:, 2])
    )


def _line_intensity(px, py):
    """Analytic slot-line marking (mirrors cam_lib.ground_line_intensity,
    unrolled over the static row/slot coordinates)."""
    hl, hw = 2.75, 1.55
    w = cam_lib.LINE_HALF_WIDTH
    dx_row = jnp.full_like(px, 1e9)
    for rx in scene_lib.ROW_X.tolist():
        dx_row = jnp.minimum(dx_row, jnp.abs(px - rx))
    dy_slot = jnp.full_like(py, 1e9)
    for sy in scene_lib.SLOT_Y.tolist():
        dy_slot = jnp.minimum(dy_slot, jnp.abs(py - sy))
    on_x = (jnp.abs(dx_row - hl) < w) & (dy_slot < hw + w)
    on_y = (jnp.abs(dy_slot - hw) < w) & (dx_row < hl + w)
    return jnp.where(on_x | on_y, 1.0, 0.0)


def _make_kernel(sim_cfg: SimConfig, n_boxes: int, tile_rows: int):
    hl = float(sim_cfg.npc_half_length)
    hw = float(sim_cfg.npc_half_width)
    hh = float(cam_lib.VEHICLE_HALF_HEIGHT)
    sl = float(sim_cfg.slot_half_length)
    sw = float(sim_cfg.slot_half_width)
    SKY = cam_lib.SKY_DEPTH
    eps = 1e-8

    def kernel(env_ref, boxes_ref, dx_ref, dy_ref, dz_ref,
               ox_ref, oy_ref, oz_ref,
               r_ref, g_ref, b_ref, depth_ref, sem_ref):
        e = pl.program_id(1)
        cam = pl.program_id(0)
        ex = env_ref[e, 0]
        ey = env_ref[e, 1]
        c = env_ref[e, 2]
        s = env_ref[e, 3]
        tgx = env_ref[e, 4]
        tgy = env_ref[e, 5]
        bright = env_ref[e, 6]
        sky_r = env_ref[e, 7]
        sky_g = env_ref[e, 8]
        sky_b = env_ref[e, 9]

        dxv = dx_ref[:]
        dyv = dy_ref[:]
        dzv = dz_ref[:]
        dwx = dxv * c - dyv * s
        dwy = dxv * s + dyv * c
        dwz = dzv
        owx = ox_ref[:] * c - oy_ref[:] * s + ex
        owy = ox_ref[:] * s + oy_ref[:] * c + ey
        owz = oz_ref[:]

        # ---- ground plane ----
        safe_dz = jnp.where(jnp.abs(dwz) < eps,
                            jnp.where(dwz >= 0, eps, -eps), dwz)
        tg = -owz / safe_dz
        ground_hit = (dwz < -1e-6) & (tg > 0)
        tg = jnp.where(ground_hit, tg, SKY)

        # ---- box loop: nearest hit stays in VMEM ----
        def body(k, carry):
            t_best, vr, vg, vb = carry
            cx = boxes_ref[e, cam, k * BOX_FIELDS + 0]
            cy = boxes_ref[e, cam, k * BOX_FIELDS + 1]
            cb = boxes_ref[e, cam, k * BOX_FIELDS + 2]
            sb = boxes_ref[e, cam, k * BOX_FIELDS + 3]
            col_r = boxes_ref[e, cam, k * BOX_FIELDS + 4]
            col_g = boxes_ref[e, cam, k * BOX_FIELDS + 5]
            col_b = boxes_ref[e, cam, k * BOX_FIELDS + 6]
            bvalid = boxes_ref[e, cam, k * BOX_FIELDS + 7]

            relx = owx - cx
            rely = owy - cy
            o0 = relx * cb + rely * sb
            o1 = -relx * sb + rely * cb
            o2 = owz - hh
            d0 = dwx * cb + dwy * sb
            d1 = -dwx * sb + dwy * cb
            d2 = dwz

            def slab(o, d, half):
                guarded = jnp.where(jnp.abs(d) < eps,
                                    jnp.where(d >= 0, eps, -eps), d)
                inv = 1.0 / guarded
                t1 = (-half - o) * inv
                t2 = (half - o) * inv
                return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

            n0, f0 = slab(o0, d0, hl)
            n1, f1 = slab(o1, d1, hw)
            n2, f2 = slab(o2, d2, hh)
            tmin = jnp.maximum(n0, jnp.maximum(n1, n2))
            tmax = jnp.minimum(f0, jnp.minimum(f1, f2))
            hit = (bvalid > 0.5) & (tmax >= tmin) & (tmax > 0) & (tmin > 0) \
                & (tmin < t_best)
            # entry face -> lambert-ish factor (x faces 0.75, y 0.9, top 1.0)
            f_light = jnp.where(
                n0 >= jnp.maximum(n1, n2), 0.75,
                jnp.where(n1 >= n2, 0.9, 1.0))
            t_best = jnp.where(hit, tmin, t_best)
            vr = jnp.where(hit, col_r * f_light, vr)
            vg = jnp.where(hit, col_g * f_light, vg)
            vb = jnp.where(hit, col_b * f_light, vb)
            return t_best, vr, vg, vb

        shape = dxv.shape
        init = (jnp.full(shape, SKY, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32))
        if n_boxes <= 16:
            # static unroll: lets Mosaic software-pipeline across boxes
            carry = init
            for k in range(n_boxes):
                carry = body(k, carry)
            t_box, vr, vg, vb = carry
        else:
            t_box, vr, vg, vb = jax.lax.fori_loop(0, n_boxes, body, init)

        # ---- ground shading ----
        pgx = owx + tg * dwx
        pgy = owy + tg * dwy
        line = _line_intensity(pgx, pgy)
        in_target = (jnp.abs(pgx - tgx) <= sl) & (jnp.abs(pgy - tgy) <= sw)
        gray = 0.32 + 0.55 * line
        gr = jnp.where(in_target, gray * 0.4 + 0.55, gray)
        gg = jnp.where(in_target, gray * 0.4, gray)
        gb = jnp.where(in_target, gray * 0.4, gray)

        # ---- sky ----
        norm = jax.lax.rsqrt(dwx * dwx + dwy * dwy + dwz * dwz + eps)
        elev = jnp.clip(dwz * norm, 0.0, 1.0)
        hor_r = sky_r * 0.8 + 0.18
        hor_g = sky_g * 0.8 + 0.18
        hor_b = sky_b * 0.8 + 0.18
        sk_r = hor_r * (1 - elev) + sky_r * elev
        sk_g = hor_g * (1 - elev) + sky_g * elev
        sk_b = hor_b * (1 - elev) + sky_b * elev

        # ---- composite ----
        box_front = t_box < tg
        t_hit = jnp.where(box_front, t_box, tg)
        is_sky = t_hit >= SKY

        out_r = jnp.where(is_sky, sk_r, jnp.where(box_front, vr, gr))
        out_g = jnp.where(is_sky, sk_g, jnp.where(box_front, vg, gg))
        out_b = jnp.where(is_sky, sk_b, jnp.where(box_front, vb, gb))
        r_ref[0] = jnp.clip(out_r * bright, 0.0, 1.0)
        g_ref[0] = jnp.clip(out_g * bright, 0.0, 1.0)
        b_ref[0] = jnp.clip(out_b * bright, 0.0, 1.0)
        depth_ref[0] = jnp.minimum(t_hit, SKY)
        sem_ref[0] = jnp.where(
            is_sky, 0.0,
            jnp.where(box_front, 1.0, jnp.where(in_target, 2.0, 0.0)))

    return kernel


@functools.partial(jax.jit, static_argnames=("sim_cfg", "n_boxes", "interpret"))
def render_cameras_pallas(ego_x, ego_y, ego_yaw, scene, sim_cfg: SimConfig,
                          weather=None, n_boxes: int = 10,
                          interpret: bool = False):
    """Batched fused render. ego_* are (E,); scene is a batched SceneState.

    Returns dict rgb (E, 4, H, W, 3), depth (E, 4, H, W), sem (E, 4, H, W).
    """
    E = ego_x.shape[0]
    H, W = sim_cfg.cam_height, sim_cfg.cam_width
    P = 4 * H * W
    rows = P // LANES
    tile_rows = (H * W) // LANES  # one tile == one camera's pixels
    assert tile_rows % 8 == 0 and rows == 4 * tile_rows
    n_tiles = 4

    planes = tuple(jnp.asarray(p) for p in _ray_planes(sim_cfg))

    if weather is None:
        weather = jnp.zeros((E,), jnp.int32)
    wrow = jnp.asarray(cam_lib.WEATHER_TABLE)[weather % len(cam_lib.WEATHER_TABLE)]

    slot_xy = jnp.asarray(scene_lib.SLOT_XY)
    target_xy = slot_xy[scene.target_idx]  # (E, 2)
    env_scalars = jnp.zeros((E, ENV_FIELDS), jnp.float32)
    env_scalars = env_scalars.at[:, 0].set(ego_x)
    env_scalars = env_scalars.at[:, 1].set(ego_y)
    env_scalars = env_scalars.at[:, 2].set(jnp.cos(ego_yaw))
    env_scalars = env_scalars.at[:, 3].set(jnp.sin(ego_yaw))
    env_scalars = env_scalars.at[:, 4].set(target_xy[:, 0])
    env_scalars = env_scalars.at[:, 5].set(target_xy[:, 1])
    env_scalars = env_scalars.at[:, 6].set(wrow[:, 0])
    env_scalars = env_scalars.at[:, 7:10].set(wrow[:, 1:4])

    # cull per (env, camera): the K nearest occupied slots that are not
    # clearly behind the camera's horizontal forward axis (conservative: a
    # box within its own radius of the image plane is kept; fov 100 deg
    # means anything truly visible passes this half-space-with-margin test)
    cam_fwd_veh = jnp.asarray([[1.0, 0.0], [0.0, -1.0], [0.0, 1.0], [-1.0, 0.0]])
    cam_off_veh = jnp.asarray(
        [[geo_spec["x"], geo_spec["y"]] for geo_spec in
         (dict(x=1.5, y=0.0), dict(x=0.0, y=-0.8), dict(x=0.0, y=0.8),
          dict(x=-2.2, y=0.0))])
    c_yaw, s_yaw = jnp.cos(ego_yaw), jnp.sin(ego_yaw)  # (E,)

    def rot(v):
        return jnp.stack([v[..., 0] * c_yaw[:, None] - v[..., 1] * s_yaw[:, None],
                          v[..., 0] * s_yaw[:, None] + v[..., 1] * c_yaw[:, None]],
                         axis=-1)

    fwd_w = rot(jnp.broadcast_to(cam_fwd_veh, (E, 4, 2)))  # (E, 4, 2)
    cam_pos = rot(jnp.broadcast_to(cam_off_veh, (E, 4, 2))) \
        + jnp.stack([ego_x, ego_y], -1)[:, None, :]
    rel = slot_xy[None, None, :, :] - cam_pos[:, :, None, :]  # (E, 4, S, 2)
    front = jnp.einsum("ecsd,ecd->ecs", rel, fwd_w) > -3.0
    d2 = jnp.sum(rel * rel, axis=-1)  # (E, 4, S)
    vis = scene.npc_valid[:, None, :] & front & (d2 < 45.0 ** 2)
    d2 = jnp.where(vis, d2, jnp.inf)
    _, top_idx = jax.lax.top_k(-d2, n_boxes)  # (E, 4, K)
    palette = jnp.asarray(cam_lib._vehicle_palette())

    def pack_boxes(idx, vis_row, yaw_row):
        sel_xy = slot_xy[idx]
        sel_yaw = jnp.take_along_axis(yaw_row, idx, axis=-1)
        sel_valid = jnp.take_along_axis(vis_row, idx, axis=-1).astype(jnp.float32)
        sel_col = palette[idx]
        return jnp.concatenate([
            sel_xy,
            jnp.cos(sel_yaw)[..., None], jnp.sin(sel_yaw)[..., None],
            sel_col,
            sel_valid[..., None],
        ], axis=-1).reshape(4, -1)  # (4, K * BOX_FIELDS)

    boxes = jax.vmap(pack_boxes)(
        top_idx, jnp.broadcast_to(vis, (E, 4, slot_xy.shape[0])),
        jnp.broadcast_to(scene.npc_yaw[:, None, :], (E, 4, slot_xy.shape[0])))

    kernel = _make_kernel(sim_cfg, n_boxes, tile_rows)
    plane_spec = pl.BlockSpec((tile_rows, LANES), lambda t, e: (t, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tile_rows, LANES), lambda t, e: (e, t, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((E, rows, LANES), jnp.float32)

    r, g, b, depth, sem = pl.pallas_call(
        kernel,
        grid=(n_tiles, E),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # env scalars, full array
            pl.BlockSpec(memory_space=pltpu.SMEM),  # packed boxes, full array
            plane_spec, plane_spec, plane_spec,
            plane_spec, plane_spec, plane_spec,
        ],
        out_specs=(out_spec,) * 5,
        out_shape=(out_shape,) * 5,
        interpret=interpret,
    )(env_scalars, boxes, *planes)

    def unflatten(a):
        return a.reshape(E, 4, H, W)

    rgb = jnp.stack([unflatten(r), unflatten(g), unflatten(b)], axis=-1)
    return {
        "rgb": rgb,
        "depth": unflatten(depth),
        "sem": unflatten(sem).astype(jnp.int32),
    }
