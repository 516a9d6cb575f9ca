"""Pallas renderer vs the pure-JAX reference implementation (interpret mode
on CPU; the real kernel path runs in bench.py on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp

from e2e_parking_carla_tpu.config import SimConfig
from e2e_parking_carla_tpu.ops.render import render_cameras_pallas
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.camera import render_cameras
from e2e_parking_carla_tpu.sim.env import SceneState, reset_env

SIM = SimConfig(cam_width=64, cam_height=64)


def sample_envs(n=2):
    keys = jax.random.split(jax.random.PRNGKey(4), n)
    targets = jnp.asarray(scene_lib.EVAL_GOAL_INDICES[:n])
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(scene_lib.eval_start_pose, in_axes=(0, None, None))(
        goal_y, 1, 6)
    return jax.vmap(reset_env)(keys, targets, xs, ys, yaws)


def test_pallas_matches_pure_renderer():
    st = sample_envs(2)
    weather = jnp.array([0, 3], jnp.int32)

    pure = jax.vmap(
        lambda x, y, yaw, sc, w: render_cameras(x, y, yaw, sc, SIM, w)
    )(st.ego.x, st.ego.y, st.ego.yaw, st.scene, weather)

    fused = render_cameras_pallas(
        st.ego.x, st.ego.y, st.ego.yaw, st.scene, SIM, weather,
        n_boxes=64, interpret=True)  # K=64: no culling, exact comparison

    rgb_a, rgb_b = np.asarray(pure["rgb"]), np.asarray(fused["rgb"])
    assert rgb_a.shape == rgb_b.shape == (2, 4, 64, 64, 3)
    # allow a small fraction of boundary pixels to differ (float order)
    mismatch = (np.abs(rgb_a - rgb_b) > 1e-3).mean()
    assert mismatch < 0.002, f"rgb mismatch fraction {mismatch}"

    d_a, d_b = np.asarray(pure["depth"]), np.asarray(fused["depth"])
    close = np.isclose(d_a, d_b, rtol=1e-3, atol=1e-2)
    assert close.mean() > 0.998, f"depth mismatch {1 - close.mean()}"

    s_a, s_b = np.asarray(pure["sem"]), np.asarray(fused["sem"])
    assert (s_a == s_b).mean() > 0.998


def test_pallas_culling_keeps_near_field():
    """K=16 culling must not change pixels of nearby vehicles."""
    st = sample_envs(1)
    full = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                 SIM, n_boxes=64, interpret=True)
    culled = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                   SIM, n_boxes=16, interpret=True)
    d_full = np.asarray(full["depth"])
    d_cull = np.asarray(culled["depth"])
    near = d_full < 15.0  # within the depth-supervision range
    np.testing.assert_allclose(d_cull[near], d_full[near], rtol=1e-3, atol=1e-2)
