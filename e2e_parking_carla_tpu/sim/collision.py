"""2D oriented-bounding-box collision tests.

Replaces CARLA's collision sensor (reference: data_generation/sensors.py:15-37
— an event the UE4 physics engine raises on any contact). In the lot the only
colliders are parked vehicles, so ego-OBB vs NPC-OBB SAT over all 64 slots
(masked) is the equivalent. Fully vectorized: one `(E,)-batched ego vs (S,)
boxes` test is a handful of (E, S) element-wise ops on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _axes(yaw):
    """Unit axes (fwd, left-normal) of a box with heading yaw. (..., 2, 2)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    fwd = jnp.stack([c, s], -1)
    lat = jnp.stack([-s, c], -1)
    return jnp.stack([fwd, lat], -2)


def obb_overlap(center_a, yaw_a, half_a, center_b, yaw_b, half_b):
    """Separating-axis test between two rectangles. All args broadcastable:
    center (..., 2), yaw (...,), half (..., 2) = (half_length, half_width).
    Returns bool (...,) — True if the boxes overlap.
    """
    center_a = jnp.asarray(center_a, jnp.float32)
    center_b = jnp.asarray(center_b, jnp.float32)
    half_a = jnp.asarray(half_a, jnp.float32)
    half_b = jnp.asarray(half_b, jnp.float32)
    yaw_a, yaw_b = jnp.broadcast_arrays(jnp.asarray(yaw_a), jnp.asarray(yaw_b))

    axes_a = _axes(yaw_a)  # (..., 2, 2)
    axes_b = _axes(yaw_b)
    axes = jnp.concatenate([axes_a, axes_b], axis=-2)  # (..., 4, 2)
    d = center_b - center_a  # (..., 2)

    # projection of the center offset on each axis
    dist = jnp.abs(jnp.einsum("...kd,...d->...k", axes, d))  # (..., 4)
    # projected radius of each box on each axis
    ra = (
        jnp.abs(jnp.einsum("...kd,...d->...k", axes, axes_a[..., 0, :])) * half_a[..., 0:1]
        + jnp.abs(jnp.einsum("...kd,...d->...k", axes, axes_a[..., 1, :])) * half_a[..., 1:2]
    )
    rb = (
        jnp.abs(jnp.einsum("...kd,...d->...k", axes, axes_b[..., 0, :])) * half_b[..., 0:1]
        + jnp.abs(jnp.einsum("...kd,...d->...k", axes, axes_b[..., 1, :])) * half_b[..., 1:2]
    )
    separated = dist > ra + rb  # any separating axis -> no overlap
    return ~jnp.any(separated, axis=-1)


def ego_hits_npcs(ego_center, ego_yaw, ego_half, npc_xy, npc_yaw, npc_valid, npc_half):
    """ego (2,), scalar yaw, (2,) half extents vs (S,2)/(S,)/(S,) NPC arrays.
    Returns scalar bool."""
    hits = obb_overlap(
        ego_center[None, :], ego_yaw[None], jnp.broadcast_to(ego_half, (npc_xy.shape[0], 2)),
        npc_xy, npc_yaw, jnp.broadcast_to(npc_half, (npc_xy.shape[0], 2)),
    )
    return jnp.any(hits & npc_valid)


def point_in_obb(points_xy, center, yaw, half):
    """points (..., 2) inside the rectangle? Used by the BEV rasterizer."""
    rel = jnp.asarray(points_xy) - jnp.asarray(center)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    local_x = rel[..., 0] * c + rel[..., 1] * s
    local_y = -rel[..., 0] * s + rel[..., 1] * c
    return (jnp.abs(local_x) <= half[..., 0]) & (jnp.abs(local_y) <= half[..., 1])
