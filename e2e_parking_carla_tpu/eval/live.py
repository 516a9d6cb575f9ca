"""Live eval view: watch the policy park, frame by frame.

The reference shows a pygame panel during closed-loop evaluation — live
cameras, BEV segmentation, control bars (carla_parking_eva.py:35-45 with
--show_eva_imgs, agent/parking_agent.py:26-68,543-597). The batched
evaluator (eval/evaluator.py) rolls whole epochs inside one lax.scan, which
is the fast path but has nothing to watch; this module runs ONE env in a
step-by-step host loop — render -> predict -> speed-limit -> 3 sim frames —
and displays each 10 Hz frame in a pygame window (or writes a GIF when no
display is available, e.g. in a headless container).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def run_live_eval(model, variables, cfg, target_idx: int = 17, seed: int = 0,
                  parking_idx: int = 0, out_gif: Optional[str] = None,
                  max_steps: Optional[int] = None, display_size=(1024, 640)):
    """Run one eval attempt live. Returns the terminal Status code.

    target_idx: goal slot id (scene.SLOT_XY index); parking_idx: which of
    the swept start poses (0..parking_nums-1, reference
    parking_position.py:135-157). If a pygame display can't open (headless)
    or `out_gif` is set, frames are written to a GIF instead.
    """
    import jax
    import jax.numpy as jnp

    from e2e_parking_carla_tpu import tokens as tok
    from e2e_parking_carla_tpu.data.rollout import normalize_images
    from e2e_parking_carla_tpu.eval.agent import (
        AgentState, apply_speed_limit, target_from_seg)
    from e2e_parking_carla_tpu.ops.dispatch import render_batch
    from e2e_parking_carla_tpu.sim import scene as scene_lib
    from e2e_parking_carla_tpu.sim.bev import target_in_ego_frame
    from e2e_parking_carla_tpu.sim.env import Status, reset_env, step_env
    from e2e_parking_carla_tpu.sim.vehicle import VehicleControl
    from e2e_parking_carla_tpu.utils.teleop import hud_lines
    from e2e_parking_carla_tpu.utils.viz import compose_frame, save_gif

    model_cfg, sim_cfg, eval_cfg = cfg.model, cfg.sim, cfg.eval
    variables = jax.device_put(variables)

    goal_y = jnp.asarray(scene_lib.SLOT_XY)[target_idx, 1]
    x0, y0, yaw0 = scene_lib.eval_start_pose(
        goal_y, jnp.int32(parking_idx), eval_cfg.parking_nums)
    env = reset_env(jax.random.PRNGKey(seed), jnp.int32(target_idx), x0, y0, yaw0)
    env = jax.tree.map(lambda a: a[None] if hasattr(a, "ndim") else a, env)

    @jax.jit
    def policy_step(variables, env, agent):
        cams = render_batch(env.ego.x, env.ego.y, env.ego.yaw, env.scene, sim_cfg)
        images = normalize_images(cams["rgb"])
        ego_motion = jnp.stack(
            [3.6 * jnp.abs(env.ego.v), env.ego.acc_x, env.ego.acc_y], axis=-1
        )[:, None, :]
        tp_gt = jax.vmap(target_in_ego_frame)(
            env.ego.x, env.ego.y, env.ego.yaw, env.scene)
        tp = jnp.where(
            agent.have_prev[:, None],
            jnp.concatenate([agent.prev_target_xy, tp_gt[:, 2:]], axis=-1), tp_gt)
        out_tokens, seg, _, _ = model.apply(
            variables, images, ego_motion, tp, method=model.predict)
        th, br, st, rv = tok.detokenize(out_tokens[:, 1:4])
        control = VehicleControl(throttle=th, brake=br, steer=st, reverse=rv)
        if eval_cfg.use_speed_limit:
            control, agent = apply_speed_limit(control, env.ego.v, agent, eval_cfg)
        new_xy, found = jax.vmap(lambda s: target_from_seg(s, model_cfg))(seg)
        agent = agent.replace(
            prev_target_xy=jnp.where(found[:, None], new_xy, agent.prev_target_xy),
            have_prev=agent.have_prev | found)
        for _ in range(sim_cfg.policy_every):
            env = jax.vmap(lambda s, c: step_env(s, c, sim_cfg, eval_cfg))(env, control)
        return env, agent, control, cams["rgb"], seg

    screen = None
    if out_gif is None:
        try:
            import pygame

            pygame.init()
            screen = pygame.display.set_mode(display_size)
            pygame.display.set_caption("e2e_parking_carla_tpu live eval")
            font = pygame.font.Font(None, 24)
            clock = pygame.time.Clock()
        except Exception as e:  # headless: fall back to a GIF
            print(f"no display ({e}); writing live_eval.gif instead")
            out_gif = "live_eval.gif"

    agent = AgentState.init((1,))
    frames = []
    n_steps = max_steps or (eval_cfg.frames_total_needed // sim_cfg.policy_every + 2)
    status = int(Status.RUNNING)
    for t in range(n_steps):
        env, agent, control, rgb, seg = policy_step(variables, env, agent)
        seg_cls = np.asarray(jnp.argmax(seg[0], axis=-1))
        frame = compose_frame(np.asarray(rgb[0]), seg_cls)
        ctrl0 = jax.tree.map(lambda a: a[0], control)
        env0 = jax.tree.map(lambda a: a[0], env)

        if screen is not None:
            import pygame

            for ev in pygame.event.get():
                if ev.type == pygame.QUIT or (
                        ev.type == pygame.KEYDOWN and ev.key == pygame.K_ESCAPE):
                    pygame.quit()
                    return status
            surf = pygame.surfarray.make_surface(frame.swapaxes(0, 1))
            sw, sh = screen.get_size()
            scale = min(sw / frame.shape[1], (sh - 120) / frame.shape[0])
            surf = pygame.transform.smoothscale(
                surf, (int(frame.shape[1] * scale), int(frame.shape[0] * scale)))
            screen.fill((12, 12, 12))
            screen.blit(surf, (0, 0))
            for i, line in enumerate(hud_lines(env0, ctrl0, clock.get_fps(), cfg)):
                screen.blit(font.render(line, True, (240, 240, 240)),
                            (8, surf.get_height() + 4 + 18 * i))
            pygame.display.flip()
            clock.tick(30)
        else:
            frames.append(frame)

        status = int(np.asarray(env.status[0]))
        if status != int(Status.RUNNING):
            break

    if screen is not None:
        import pygame

        pygame.quit()
    elif frames and out_gif:
        save_gif(frames, out_gif, fps=10)
        print(f"wrote {out_gif} ({len(frames)} frames, status={status})")
    return status
