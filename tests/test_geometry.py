"""Geometry tests: CARLA-convention transforms, rig construction, frustum."""

import math

import numpy as np

from e2e_parking_carla_tpu import geometry as geo


def test_rotation_identity():
    np.testing.assert_allclose(geo.rotation_matrix(0, 0, 0), np.eye(3), atol=1e-12)


def test_rotation_orthonormal():
    rng = np.random.RandomState(0)
    for _ in range(20):
        r, p, y = rng.uniform(-180, 180, 3)
        R = geo.rotation_matrix(r, p, y)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert abs(np.linalg.det(R) - 1.0) < 1e-10


def test_yaw_rotates_x_toward_y():
    # CARLA convention: yaw=90 turns +x into +y (left-handed, y right).
    R = geo.rotation_matrix(0, 0, 90)
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-12)


def test_left_camera_forward_axis():
    # Left camera (yaw=-90, pitch=-40) looks left (-y) and down (-z)
    # (reference world.py:255-259).
    R = geo.rotation_matrix(0.0, -40.0, -90.0)
    fwd = R @ np.array([1.0, 0.0, 0.0])
    assert fwd[1] < -0.7  # mostly -y
    assert fwd[2] < -0.6  # pitched down
    assert abs(fwd[0]) < 1e-9


def test_inverse_rigid():
    rng = np.random.RandomState(1)
    for _ in range(10):
        m = geo.transform_matrix(*rng.uniform(-5, 5, 3), *rng.uniform(-90, 90, 3))
        np.testing.assert_allclose(geo.inverse_rigid(m) @ m, np.eye(4), atol=1e-10)


def test_intrinsics():
    K = geo.camera_intrinsics(400, 300, 100.0)
    f = 400 / (2 * math.tan(math.radians(50)))
    assert abs(K[0, 0] - f) < 1e-9
    assert K[0, 2] == 200.0 and K[1, 2] == 150.0


def test_rig_cropped_principal_point():
    intr, extr = geo.build_rig(image_crop=256)
    assert intr.shape == (4, 3, 3)
    assert extr.shape == (4, 4, 4)
    # After center crop to 256, the principal point is the image center.
    np.testing.assert_allclose(intr[:, 0, 2], 128.0, atol=1e-5)
    np.testing.assert_allclose(intr[:, 1, 2], 128.0, atol=1e-5)


def test_front_camera_projection():
    """A point 10 m ahead of the ego at camera height projects to the image
    center of the front camera."""
    intr, extr = geo.build_rig(image_crop=256)
    K, E = intr[0].astype(np.float64), extr[0].astype(np.float64)
    p_veh = np.array([11.5, 0.0, 1.5, 1.0])  # 10 m ahead of cam at x=1.5,z=1.5
    p_cam = E @ p_veh
    assert abs(p_cam[2] - 10.0) < 1e-6  # depth = 10
    uvw = K @ p_cam[:3]
    u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
    assert abs(u - 128.0) < 1e-4 and abs(v - 128.0) < 1e-4


def test_bev_grid_parameters():
    res, start, dim = geo.bev_grid_parameters((-10.0, 10.0, 0.1), (-10.0, 10.0, 0.1), (-10.0, 10.0, 20.0))
    np.testing.assert_allclose(res, [0.1, 0.1, 20.0])
    np.testing.assert_allclose(start, [-9.95, -9.95, 0.0])
    np.testing.assert_array_equal(dim, [200, 200, 1])


def test_frustum_shape_and_bounds():
    fr = geo.create_frustum((256, 256), 8, (0.5, 12.5, 0.25))
    assert fr.shape == (48, 32, 32, 3)
    assert fr[..., 2].min() == 0.5 and abs(fr[..., 2].max() - 12.25) < 1e-6
    assert fr[..., 0].min() == 0.0 and fr[..., 0].max() == 255.0


def test_frustum_to_ego_front_center():
    intr, extr = geo.build_rig(image_crop=256)
    fr = geo.create_frustum((256, 256), 8, (0.5, 12.5, 0.25))
    ego_pts = geo.frustum_to_ego(fr, intr, extr)
    assert ego_pts.shape == (4, 48, 32, 32, 3)
    # Depth plane d for the front camera center pixel: approximately
    # (1.5 + d, 0, 1.5) in the vehicle frame. Center of a 32-grid isn't an
    # exact pixel; check the small-offset pixel nearest center.
    d_idx = 10  # depth = 0.5 + 10*0.25 = 3.0
    pt = ego_pts[0, d_idx, 15, 15]
    # pixel (15,15)*8+ some offset -> near center; x should be ~1.5+3.0
    assert abs(pt[0] - 4.5) < 0.15
    assert abs(pt[1]) < 0.5 and abs(pt[2] - 1.5) < 0.5


def test_convert_slot_coord_wraps_yaw():
    out = np.asarray(geo.convert_slot_coord(
        np.array([290.9, -220.0, 180.0], np.float32),
        np.array([285.6, -225.0, 90.0], np.float32),
    ))
    # ego at yaw=90 (facing +y): slot ahead-right
    # rel world = (5.3, 5.0); ego frame: x = rel.x*cos90+rel.y*sin90 = 5.0
    assert abs(out[0] - 5.0) < 1e-4
    assert abs(out[1] - (-5.3)) < 1e-4
    assert abs(out[2] - 90.0) < 1e-4

    out2 = np.asarray(geo.convert_slot_coord(
        np.array([0.0, 0.0, 180.0], np.float32),
        np.array([0.0, 0.0, -90.0], np.float32),
    ))
    assert abs(out2[2] - (-90.0)) < 1e-4  # 270 wraps to -90


def test_world_ego_round_trip():
    rng = np.random.RandomState(2)
    pts = rng.uniform(-20, 20, (50, 2)).astype(np.float32)
    ego_xy = np.array([3.0, -4.0], np.float32)
    yaw = 1.1
    back = np.asarray(geo.ego_to_world_xy(geo.world_to_ego_xy(pts, ego_xy, yaw), ego_xy, yaw))
    np.testing.assert_allclose(back, pts, atol=1e-4)
