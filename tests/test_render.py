"""Rendering tests: BEV semantic GT rasterizer and the surround-camera
ray renderer (pure-JAX reference implementation)."""

import numpy as np
import jax
import jax.numpy as jnp

from e2e_parking_carla_tpu.config import ModelConfig, SimConfig
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.bev import (
    bev_cell_centers,
    render_bev_seg,
    target_in_ego_frame,
)
from e2e_parking_carla_tpu.sim.camera import render_cameras, camera_rays
from e2e_parking_carla_tpu.sim.env import SceneState

MODEL = ModelConfig()
SIM = SimConfig()


def make_scene(target_idx=16, npc_slots=(), npc_yaw=0.0):
    npc_valid = np.zeros(64, bool)
    for s in npc_slots:
        npc_valid[s] = True
    return SceneState(
        npc_valid=jnp.asarray(npc_valid),
        npc_yaw=jnp.full(64, npc_yaw, jnp.float32),
        goal_free=jnp.asarray(~npc_valid),
        target_idx=jnp.int32(target_idx),
    )


# ---------------------------------------------------------------------------
# BEV rasterizer
# ---------------------------------------------------------------------------


def test_cell_centers():
    cells = bev_cell_centers(MODEL)
    assert cells.shape == (200, 200, 2)
    np.testing.assert_allclose(cells[0, 0, 0], -9.95, atol=1e-5)
    np.testing.assert_allclose(cells[199, 0, 0], 9.95, atol=1e-5)
    np.testing.assert_allclose(cells[0, 0, 1], -9.95, atol=1e-5)


def test_target_stamp_centered():
    # ego parked dead-center on the target slot, aligned with the slot axis
    slot = scene_lib.SLOT_XY[16]
    scene = make_scene(target_idx=16)
    seg = np.asarray(render_bev_seg(
        jnp.float32(slot[0]), jnp.float32(slot[1]), jnp.float32(np.pi),
        scene, MODEL, SIM))
    assert seg.shape == (200, 200)
    n_target = (seg == 2).sum()
    # 5.5 x 3.1 m at 0.1 m -> ~55x31 cells (float boundary cells may drop a
    # row/column either side)
    assert 54 * 30 <= n_target <= 56 * 32
    # stamp centered on the grid center
    rows, cols = np.where(seg == 2)
    assert abs(rows.mean() - 99.5) < 1.0 and abs(cols.mean() - 99.5) < 1.0
    assert (seg == 1).sum() == 0  # no NPCs


def test_target_stamp_rotation():
    # ego heading +90 (perpendicular to slot axis): stamp appears rotated
    slot = scene_lib.SLOT_XY[16]
    scene = make_scene(target_idx=16)
    seg = np.asarray(render_bev_seg(
        jnp.float32(slot[0]), jnp.float32(slot[1]), jnp.float32(np.pi / 2),
        scene, MODEL, SIM))
    rows, cols = np.where(seg == 2)
    # long axis now along ego-y (columns)
    assert cols.max() - cols.min() > rows.max() - rows.min()


def test_vehicle_stamp_position():
    # ego in the aisle facing +y; NPC in slot 17 (row2: x=290.9)
    scene = make_scene(target_idx=20, npc_slots=(17,))
    ego_x, ego_y = 285.6, -232.73  # same y as slot 17
    seg = np.asarray(render_bev_seg(
        jnp.float32(ego_x), jnp.float32(ego_y), jnp.float32(np.pi / 2),
        scene, MODEL, SIM))
    rows, cols = np.where(seg == 1)
    assert len(rows) > 0
    # NPC is 5.3 m to the ego's RIGHT when heading +y (world +x is ego right
    # at yaw=90... ego-frame y = -(290.9-285.6)? check: ego yaw=+90 ->
    # ego x-axis = world +y, ego y-axis = world -x... no: left-handed frame,
    # y_ego = -sin*dx + cos*dy with dx=5.3, dy=0 -> y_ego = -5.3
    cell_y = -10.0 + (cols.mean() + 0.5) * 0.1
    assert abs(cell_y - (-5.3)) < 0.5
    cell_x = -10.0 + (rows.mean() + 0.5) * 0.1
    assert abs(cell_x) < 0.5
    # NPC box 4.7x2.1 m -> ~47x21 cells, but rotated 90 in ego frame
    n = (seg == 1).sum()
    assert 40 * 18 <= n <= 50 * 24


def test_target_in_ego_frame():
    slot = scene_lib.SLOT_XY[16]
    scene = make_scene(target_idx=16)
    out = np.asarray(target_in_ego_frame(
        jnp.float32(285.6), jnp.float32(slot[1] - 4.0), jnp.float32(np.pi / 2), scene))
    # ego 4 m behind (in y) the slot's y, heading +y; slot is 5.3 m right
    assert abs(out[0] - 4.0) < 1e-4  # ahead
    assert abs(out[1] - (-(slot[0] - 285.6))) < 1e-4  # left/right
    assert abs(out[2] - 90.0) < 1e-4


# ---------------------------------------------------------------------------
# camera renderer
# ---------------------------------------------------------------------------


def test_camera_rays_static():
    dirs, origins = camera_rays(SIM)
    assert dirs.shape == (4, 256, 256, 3)
    assert origins.shape == (4, 3)
    # front camera center pixel looks straight ahead
    center = dirs[0, 127, 127] + dirs[0, 128, 128]
    assert abs(center[1]) < 0.01 and abs(center[2]) < 0.01
    np.testing.assert_allclose(origins[0], [1.5, 0.0, 1.5])


def test_render_ground_and_sky():
    scene = make_scene(target_idx=16)
    out = render_cameras(jnp.float32(285.6), jnp.float32(-220.0),
                         jnp.float32(np.pi / 2), scene, SIM)
    rgb, depth, sem = np.asarray(out["rgb"]), np.asarray(out["depth"]), np.asarray(out["sem"])
    assert rgb.shape == (4, 256, 256, 3) and depth.shape == (4, 256, 256)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # front camera: top rows are sky (far), bottom rows are ground (near)
    assert depth[0, 10, 128] >= 999.0
    assert depth[0, 250, 128] < 5.0
    # side cameras pitch down 40deg: mostly ground
    assert (depth[1] < 100).mean() > 0.6
    # ground depth roughly h / sin(elevation) sanity: bottom center of front
    # cam looks down ~37deg -> depth ~ 1.5/tan(37) ~ 2.0 along fwd
    assert 1.0 < depth[0, 255, 128] < 4.0


def test_render_vehicle_visible():
    # NPC straight ahead of ego (~5.3 m): front camera sees it
    scene = make_scene(target_idx=20, npc_slots=(17,))
    ego_x, ego_y = 285.6, -232.73
    out = render_cameras(jnp.float32(ego_x), jnp.float32(ego_y),
                         jnp.float32(0.0), scene, SIM)  # heading +x, toward slot 17
    sem = np.asarray(out["sem"])
    depth = np.asarray(out["depth"])
    veh_mask = sem[0] == 1
    assert veh_mask.sum() > 500  # a car 3 m away fills a chunk of the frame
    # depth at vehicle pixels ~ distance to the near face
    near_face = (290.9 - SIM.npc_half_length) - (ego_x + 1.5)  # cam at x+1.5
    d_veh = depth[0][veh_mask]
    assert abs(d_veh.min() - near_face) < 0.5


def test_render_target_marking_visible():
    # target slot ahead: red tint pixels present in the front camera
    scene = make_scene(target_idx=17)
    ego_x, ego_y = 285.6, -232.73
    out = render_cameras(jnp.float32(ego_x), jnp.float32(ego_y),
                         jnp.float32(0.0), scene, SIM)
    sem = np.asarray(out["sem"])
    rgb = np.asarray(out["rgb"])
    tmask = sem[0] == 2
    assert tmask.sum() > 200
    # red channel dominates on the target marking
    assert (rgb[0][tmask][:, 0] > rgb[0][tmask][:, 1] + 0.1).all()


def test_render_jit_vmap():
    scene = make_scene(target_idx=16, npc_slots=(17, 18, 19))
    batch_scene = jax.tree.map(lambda x: jnp.stack([x, x]), scene)
    f = jax.jit(jax.vmap(
        lambda x, y, yaw, sc: render_cameras(x, y, yaw, sc, SIM)))
    out = f(jnp.array([285.6, 286.0], jnp.float32),
            jnp.array([-220.0, -221.0], jnp.float32),
            jnp.array([np.pi / 2, -np.pi / 2], jnp.float32),
            batch_scene)
    assert out["rgb"].shape == (2, 4, 256, 256, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_weather_changes_brightness():
    scene = make_scene(target_idx=16)
    a = np.asarray(render_cameras(jnp.float32(285.6), jnp.float32(-220.0),
                                  jnp.float32(0.0), scene, SIM, weather=0)["rgb"])
    b = np.asarray(render_cameras(jnp.float32(285.6), jnp.float32(-220.0),
                                  jnp.float32(0.0), scene, SIM, weather=5)["rgb"])
    assert a.mean() > b.mean()  # preset 5 (HardRainNoon) is darker
