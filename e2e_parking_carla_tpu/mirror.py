"""Ego-axis mirror transforms shared by training augmentation and
test-time mirror ensembling.

The camera rig is exactly left-right symmetric (geometry.py CAM_RIG:
left/right at y=-/+0.8 with yaw -/+90 and equal pitch; front/rear
centered), and the per-pixel ray tables use pixel centers (u+0.5, cx=W/2),
so the observation of the world reflected across the ego's longitudinal
axis through the STANDARD rig is EXACTLY the left<->right camera swap plus
horizontal pixel flip of the original render (proven numerically by
tests/test_mirror.py::test_rig_is_exactly_mirror_symmetric). Bicycle
dynamics mirror-commute, so the mirrored world's correct control is the
original control with negated steer.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from e2e_parking_carla_tpu import tokens as tok

# CAM_ORDER is (front, left, right, rear): swap the side cameras
MIRROR_CAM_PERM = (0, 2, 1, 3)

# ego_motion is (speed, longitudinal acc, lateral acc): negate lateral
EGO_MOTION_SIGNS = (1.0, 1.0, -1.0)
# target_point is (x, y, relative yaw deg) in the ego frame
TARGET_SIGNS = (1.0, -1.0, -1.0)


def mirror_images(images: jnp.ndarray) -> jnp.ndarray:
    """(B, 4, H, W, C) or (B, 4, H, W): swap left<->right cams, flip W."""
    perm = jnp.asarray(MIRROR_CAM_PERM)
    if images.ndim == 5:
        return images[:, perm, :, ::-1, :]
    return images[:, perm, :, ::-1]


def mirror_observation(images, ego_motion, target_point):
    """Mirror the model's input triple across the ego's longitudinal axis."""
    return (mirror_images(images),
            ego_motion * jnp.asarray(EGO_MOTION_SIGNS),
            target_point * jnp.asarray(TARGET_SIGNS))


def _steer_perm() -> np.ndarray:
    """Vocab permutation mapping a steer token to its mirror.

    Steer s tokenizes to floor((s+1)*100) in [0, 200] (tokens.py), so the
    involution k -> 200-k is exact at the tokens maneuvers actually
    saturate on (s in {-1, 0, +1} and every bin edge) and one bin
    (0.01 steer) off for interior values — negligible for logit averaging.
    Throttle/brake, reverse, and the special tokens map to themselves
    (the permutation is only applied at steer positions).
    """
    p = np.arange(tok.TOKEN_NUMS, dtype=np.int32)
    p[: tok.VALID_TOKEN + 1] = tok.VALID_TOKEN - p[: tok.VALID_TOKEN + 1]
    return p


STEER_TOKEN_PERM = _steer_perm()


def is_steer_index(token_index):
    """True where a (BOS-prefixed) sequence index holds a steer token.

    Layout: index 0 = BOS, then repeating (throttle_brake, steer, reverse),
    so index j >= 1 is steer iff (j - 1) % 3 == 1.
    """
    return (token_index - 1) % 3 == 1


def mirror_sequence(tokens_: jnp.ndarray) -> jnp.ndarray:
    """Mirror a (B, L) BOS-prefixed control-token sequence: permute the
    steer positions, leave throttle/brake, reverse, and specials alone."""
    L = tokens_.shape[-1]
    steer_pos = is_steer_index(jnp.arange(L))
    perm = jnp.asarray(STEER_TOKEN_PERM)
    return jnp.where(steer_pos, perm[tokens_], tokens_)
