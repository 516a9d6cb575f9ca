"""DAgger-style correction data: policy rollouts labeled by the expert.

Behavioral cloning alone (the reference's recipe — human demos replayed from
disk) suffers compounding error: the policy visits states the expert never
showed it, especially near obstacles, and has no supervision there. The
round-1 symptom was a collision rate ~9x the paper's at matched TSR.

Because the scripted expert (sim/expert.py) is a pure function of simulator
state, corrections are nearly free on device: roll out a beta-mixture of the
CURRENT policy and the expert (the classic DAgger execution mixture), and at
every visited state record the EXPERT's recommended control as the label.
The result is an `EpisodeBuffer` whose control fields hold expert labels at
policy-visited states; `data.rollout.make_batch` consumes it unchanged, so
training batches can be drawn from a concatenation of BC and DAgger buffers.

There is no reference analog (the reference cannot query its human experts
at arbitrary states); the closest concept is its online closed-loop
evaluation (data_generation/network_evaluator.py), whose render->predict->
detokenize->speed-limit loop this reuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from e2e_parking_carla_tpu import tokens as tok
from e2e_parking_carla_tpu.config import EvalConfig, ModelConfig, SimConfig
from e2e_parking_carla_tpu.data.rollout import EpisodeBuffer, normalize_images
from e2e_parking_carla_tpu.eval.agent import AgentState, apply_speed_limit
from e2e_parking_carla_tpu.ops.dispatch import render_batch
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.bev import target_in_ego_frame
from e2e_parking_carla_tpu.sim.env import Status, reset_env, step_env
from e2e_parking_carla_tpu.sim.expert import ExpertState, expert_policy
from e2e_parking_carla_tpu.sim.vehicle import VehicleControl


def collect_dagger_episodes(
    predict,
    variables,
    key: jax.Array,
    n_envs: int,
    model_cfg: ModelConfig,
    sim_cfg: SimConfig,
    eval_cfg: EvalConfig,
    expert_mix: float = 0.5,
    max_frames: int = 900,
    drop_hold_labels: bool = True,
    drop_timeout_episodes: bool = True,
    timeout_keep_every: int = 0,
    start_near_frac: float = 0.0,
) -> EpisodeBuffer:
    """Roll out `n_envs` episodes under the policy/expert execution mixture
    and label every visited state with the expert's control.

    predict: (variables, images, ego_motion, target_point) -> (tokens, ...)
        the model's autoregressive predict fn; `variables` is passed through
        explicitly so one jitted collection program serves every refresh.
    expert_mix: per-env-step probability that the EXPERT's action is the one
        executed (the label is always the expert's action either way).
    drop_hold_labels: exclude frames where the expert's phase machine is in
        HOLD (phase 4, full brake forever). Round-2 measurement: aggressive
        DAgger taught the policy to stop at off-manifold states (TR
        7% -> 65%) because HOLD emits unconditional stop labels wherever the
        machine last gave up; the BC buffer already supervises the legitimate
        stop-at-goal from properly parked states.
    drop_timeout_episodes: exclude ALL frames of episodes that end in
        TIMEOUT/OUTBOUND (or never terminate). Those trajectories are
        dominated by a confused expert state machine (give-up trims, stale
        phases at states it cannot recover from), and — being the longest
        episodes — they otherwise flood the uniform frame sampler with
        conservative labels: a timeout contributes ~290 frames where a
        collision episode contributes ~30.
    timeout_keep_every: with drop_timeout_episodes, keep every Nth frame of
        a timeout/outbound episode instead of none (0 = drop all, the
        round-2 behavior). Dropping whole episodes removes supervision at
        exactly the states where the policy gets STUCK — the round-3 b0
        protocol's largest failure class (76/384 timeouts vs 32 collisions).
        A stride of 3-4 caps a timeout episode's buffer share at roughly a
        collision episode's while keeping the expert's recovery labels at
        visited stuck states.

    Fully jittable: the whole fleet advances in one lax.scan at the 10 Hz
    policy rate (decisions held for `policy_every` sim frames, matching the
    agent cadence, reference parking_agent.py:228,370).
    """
    k_goal, k_pose, k_scene, k_weather, k_mix = jax.random.split(key, 5)
    goal_choices = jnp.asarray(scene_lib.DATAGEN_GOAL_INDICES)
    targets = goal_choices[jax.random.randint(k_goal, (n_envs,), 0, len(goal_choices))]
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(
        lambda kk, gy: scene_lib.datagen_start_pose(
            kk, gy, near_frac=start_near_frac))(
        jax.random.split(k_pose, n_envs), goal_y)
    env = jax.vmap(reset_env)(
        jax.random.split(k_scene, n_envs), targets, xs, ys, yaws)
    weather = jax.random.randint(k_weather, (n_envs,), 0, 14)

    est = ExpertState.init((n_envs,))
    agent = AgentState.init((n_envs,))
    k = sim_cfg.policy_every
    n_steps = max_frames // k

    def body(carry, key_t):
        s, e, ag = carry
        # expert label at the visited state (the state machine advances along
        # the VISITED trajectory, so its phase stays consistent with where
        # the mixture actually drove)
        exp_ctrl, e = jax.vmap(lambda a, b, c: expert_policy(a, b, c, sim_cfg))(
            s.ego, s.scene, e)

        cams = render_batch(s.ego.x, s.ego.y, s.ego.yaw, s.scene, sim_cfg, weather)
        images = normalize_images(cams["rgb"])
        ego_motion = jnp.stack(
            [3.6 * jnp.abs(s.ego.v), s.ego.acc_x, s.ego.acc_y], axis=-1)[:, None, :]
        tp = jax.vmap(target_in_ego_frame)(s.ego.x, s.ego.y, s.ego.yaw, s.scene)
        out = predict(variables, images, ego_motion, tp)
        tokens = out[0]
        th, br, st, rv = tok.detokenize(tokens[:, 1:4])
        pol_ctrl = VehicleControl(throttle=th, brake=br, steer=st, reverse=rv)
        if eval_cfg.use_speed_limit:  # match the evaluator's gating
            pol_ctrl, ag = apply_speed_limit(pol_ctrl, s.ego.v, ag, eval_cfg)

        use_expert = jax.random.bernoulli(key_t, expert_mix, (n_envs,))
        ctrl = jax.tree.map(
            lambda a, b: jnp.where(use_expert, a, b), exp_ctrl, pol_ctrl)

        s_next = s
        for _ in range(k):
            s_next = jax.vmap(lambda st_, c: step_env(st_, c, sim_cfg, eval_cfg))(
                s_next, ctrl)

        snap = {
            "x": s.ego.x, "y": s.ego.y, "yaw": s.ego.yaw,
            "speed": 3.6 * jnp.abs(s.ego.v),
            "acc_x": s.ego.acc_x, "acc_y": s.ego.acc_y,
            # LABEL fields: the expert's recommendation, NOT the executed
            # control — make_batch tokenizes these into the supervision
            "throttle": exp_ctrl.throttle, "brake": exp_ctrl.brake,
            "steer": exp_ctrl.steer, "reverse": exp_ctrl.reverse,
            "status": s_next.status,
            # post-update phase: HOLD here is what forces the stop label
            "expert_phase": e.phase,
        }
        return (s_next, e, ag), snap

    (final, _, _), traj = jax.lax.scan(
        body, (env, est, agent), jax.random.split(k_mix, n_steps))
    traj = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), traj)  # (E, T)
    T = traj["x"].shape[1]

    # usable frames: before the first terminal status, with room for the
    # future-control window; unlike BC collection, success is NOT required —
    # recovery states on failed attempts are exactly the point
    done = traj["status"] != Status.RUNNING
    first_done = jnp.argmax(done, axis=1)
    ended = done.any(axis=1)
    end = jnp.where(ended, first_done, T)
    t_idx = jnp.arange(T)[None, :]
    valid = ((t_idx >= model_cfg.hist_frame_nums)
             & (t_idx < end[:, None] - model_cfg.future_frame_nums))
    if drop_hold_labels:
        valid &= traj["expert_phase"] != 4
    if drop_timeout_episodes:
        end_status = jnp.take_along_axis(
            traj["status"], end[:, None].clip(max=T - 1), axis=1)[:, 0]
        bad_end = (~ended) | (end_status == Status.TIMEOUT) \
            | (end_status == Status.OUTBOUND)
        if timeout_keep_every > 0:
            valid &= (~bad_end[:, None]) | (t_idx % timeout_keep_every == 0)
        else:
            valid &= ~bad_end[:, None]

    return EpisodeBuffer(
        ego_x=traj["x"], ego_y=traj["y"], ego_yaw=traj["yaw"],
        speed=traj["speed"], acc_x=traj["acc_x"], acc_y=traj["acc_y"],
        throttle=traj["throttle"], brake=traj["brake"],
        steer=traj["steer"], reverse=traj["reverse"],
        npc_valid=final.scene.npc_valid, npc_yaw=final.scene.npc_yaw,
        target_idx=final.scene.target_idx, weather=weather,
        valid=valid, success=final.status == Status.TARGET_SUCCESS,
    )


def concat_buffers(a: EpisodeBuffer, b: EpisodeBuffer) -> EpisodeBuffer:
    """Stack two episode buffers along the env axis (frame counts must
    match). Sampling in make_batch is uniform over valid frames, so the
    BC:DAgger data ratio is set by each buffer's valid-frame count."""
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)
