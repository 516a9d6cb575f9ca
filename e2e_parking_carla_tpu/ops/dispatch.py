"""Backend dispatch for the hot render path: fused Pallas kernel on TPU,
pure-JAX reference implementation elsewhere (CPU tests, debugging)."""

from __future__ import annotations

import jax

from e2e_parking_carla_tpu.config import SimConfig


def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def render_batch(ego_x, ego_y, ego_yaw, scene, sim_cfg: SimConfig, weather=None):
    """Batched surround render: (E,) states -> dict rgb/depth/sem."""
    if on_tpu():
        from e2e_parking_carla_tpu.ops.render import render_cameras_pallas

        return render_cameras_pallas(ego_x, ego_y, ego_yaw, scene, sim_cfg,
                                     weather)
    from e2e_parking_carla_tpu.sim.camera import render_cameras

    if weather is None:
        return jax.vmap(
            lambda x, y, yaw, sc: render_cameras(x, y, yaw, sc, sim_cfg)
        )(ego_x, ego_y, ego_yaw, scene)
    return jax.vmap(
        lambda x, y, yaw, sc, w: render_cameras(x, y, yaw, sc, sim_cfg, w)
    )(ego_x, ego_y, ego_yaw, scene, weather)
