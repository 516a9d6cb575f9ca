"""Headline benchmark: env steps/sec/chip with 4-camera rendering.

Runs a vmapped fleet of parking environments under one jitted lax.scan —
expert policy, dynamics, collision/termination bookkeeping, and the full
4-camera 256x256 RGB+depth render EVERY frame — and reports simulated env
frames per wall-clock second on the current chip.

Baseline (BASELINE.json north star): 100,000 env steps/s/chip on a v5e.
The reference's CARLA server steps one environment at 30 FPS wall-clock
(data_generation/world.py:33-38).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "steps/s/chip", "vs_baseline": N}
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 100_000.0


def build_bench(n_envs: int, render: bool = True, use_pallas: bool = True):
    from e2e_parking_carla_tpu.config import EvalConfig, SimConfig
    from e2e_parking_carla_tpu.ops.render import render_cameras_pallas
    from e2e_parking_carla_tpu.sim import scene as scene_lib
    from e2e_parking_carla_tpu.sim.camera import render_cameras
    from e2e_parking_carla_tpu.sim.env import reset_env, step_env
    from e2e_parking_carla_tpu.sim.expert import ExpertState, expert_policy

    sim_cfg, eval_cfg = SimConfig(), EvalConfig()

    goals = jnp.asarray(scene_lib.EVAL_GOAL_INDICES)
    key = jax.random.PRNGKey(0)
    targets = goals[jax.random.randint(key, (n_envs,), 0, len(goals))]
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(scene_lib.datagen_start_pose)(
        jax.random.split(key, n_envs), goal_y)
    states = jax.vmap(reset_env)(
        jax.random.split(jax.random.PRNGKey(1), n_envs), targets, xs, ys, yaws)
    est = ExpertState.init((n_envs,))

    render_every = int(os.environ.get("BENCH_RENDER_EVERY", "1"))
    bands = int(os.environ.get("BENCH_BANDS", "-1"))  # -1 = renderer default

    def body(carry, i):
        s, e, acc = carry
        ctrl, e = jax.vmap(lambda a, b, c: expert_policy(a, b, c, sim_cfg))(
            s.ego, s.scene, e)
        s = jax.vmap(lambda st, c: step_env(st, c, sim_cfg, eval_cfg))(s, ctrl)
        if render and render_every > 1:
            # policy-rate mode: render only on policy-cadence frames (what
            # training and eval actually consume, parking_agent.py:228)
            def do_render(st):
                cams = render_cameras_pallas(
                    st.ego.x, st.ego.y, st.ego.yaw, st.scene, sim_cfg,
                    **({} if bands < 0 else {"bands": bands}))
                return jnp.sum(cams["rgb"]) + jnp.sum(cams["depth"])

            sink = jax.lax.cond(i % render_every == 0, do_render,
                                lambda st: jnp.float32(0.0), s)
        elif render:
            if use_pallas:
                cams = render_cameras_pallas(
                    s.ego.x, s.ego.y, s.ego.yaw, s.scene, sim_cfg,
                    **({} if bands < 0 else {"bands": bands}))
            else:
                cams = jax.vmap(
                    lambda x, y, yaw, sc: render_cameras(x, y, yaw, sc, sim_cfg)
                )(s.ego.x, s.ego.y, s.ego.yaw, s.scene)
            # consume EVERY pixel so nothing can be elided, and feed the sum
            # back through the carry so steps are strictly sequential
            sink = jnp.sum(cams["rgb"]) + jnp.sum(cams["depth"])
        else:
            sink = s.ego.x.sum()
        return (s, e, acc + sink), None

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(carry, n_steps):
        (s, e, acc), _ = jax.lax.scan(body, carry, jnp.arange(n_steps))
        return (s, e, acc)

    return (states, est, jnp.float32(0.0)), run


def check_render_correctness(n_envs: int = 4) -> None:
    """Compare the compiled Pallas renderer against the pure-JAX renderer on
    the CURRENT device (the only other place the Mosaic-compiled path runs is
    this benchmark; unit tests exercise interpret mode on CPU). Raises on
    divergence so a Mosaic-vs-interpret discrepancy can never publish a
    benchmark number silently.

    Two checks: (1) with culling disabled (all 64 boxes) the kernel must
    match the pure renderer bit-for-bit — this isolates Mosaic codegen;
    (2) at the default cull K the only allowed difference is the documented
    LOD approximation (distant boxes dropped), bounded at 2% of pixels."""
    from e2e_parking_carla_tpu.config import SimConfig
    from e2e_parking_carla_tpu.ops.render import render_cameras_pallas
    from e2e_parking_carla_tpu.sim import scene as scene_lib
    from e2e_parking_carla_tpu.sim.camera import render_cameras
    from e2e_parking_carla_tpu.sim.env import reset_env

    import numpy as np

    sim_cfg = SimConfig()
    goals = jnp.asarray(scene_lib.EVAL_GOAL_INDICES)
    key = jax.random.PRNGKey(7)
    targets = goals[jax.random.randint(key, (n_envs,), 0, len(goals))]
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(scene_lib.datagen_start_pose)(
        jax.random.split(key, n_envs), goal_y)
    env = jax.vmap(reset_env)(
        jax.random.split(jax.random.PRNGKey(8), n_envs), targets, xs, ys, yaws)

    ref = jax.jit(jax.vmap(
        lambda x, y, yaw, sc: render_cameras(x, y, yaw, sc, sim_cfg)
    ))(env.ego.x, env.ego.y, env.ego.yaw, env.scene)

    full = jax.jit(lambda: render_cameras_pallas(
        env.ego.x, env.ego.y, env.ego.yaw, env.scene, sim_cfg,
        n_boxes=sim_cfg.max_static_vehicles))()
    for name, tol in (("rgb", 1e-5), ("depth", 1e-4)):
        a = np.asarray(full[name], np.float32)
        b = np.asarray(ref[name], np.float32)
        err = np.abs(a - b).max()
        if not np.isfinite(a).all() or err > tol:
            raise AssertionError(
                f"Pallas renderer (no cull) diverges from pure renderer "
                f"on-device: {name} max|diff|={err:.3e} (tol {tol})")
    if (np.asarray(full["sem"]) != np.asarray(ref["sem"])).any():
        raise AssertionError("Pallas renderer (no cull) semantic id mismatch")

    culled = jax.jit(lambda: render_cameras_pallas(
        env.ego.x, env.ego.y, env.ego.yaw, env.scene, sim_cfg))()
    frac = float((np.abs(np.asarray(culled["rgb"], np.float32)
                         - np.asarray(ref["rgb"], np.float32)).max(-1)
                  > 1e-3).mean())
    if frac > 0.02:
        raise AssertionError(
            f"cull LOD error out of budget: {frac:.2%} of pixels differ")

    # (3) the same two checks at MID-MANEUVER poses: the training/eval
    # pipelines render every visited state, and near-field boxes stress the
    # sector culling hardest when the ego sits between parked rows (advisor
    # round-2 finding: start-pose checks alone never exercise these). Two
    # depths: 150 frames (5 s, approach) and 450 frames (15 s, deep into the
    # reverse-in maneuver — closest approach to neighbor boxes).
    from e2e_parking_carla_tpu.config import EvalConfig
    from e2e_parking_carla_tpu.sim.env import step_env
    from e2e_parking_carla_tpu.sim.expert import ExpertState, expert_policy

    eval_cfg = EvalConfig()

    @functools.partial(jax.jit, static_argnums=(1,))
    def advance(carry, n_frames):
        def body(carry, _):
            s, e = carry
            ctrl, e = jax.vmap(
                lambda a, b, c: expert_policy(a, b, c, sim_cfg))(s.ego, s.scene, e)
            s = jax.vmap(lambda st, c: step_env(st, c, sim_cfg, eval_cfg))(s, ctrl)
            return (s, e), None

        return jax.lax.scan(body, carry, None, length=n_frames)[0]

    carry = (env, ExpertState.init((n_envs,)))
    frames_done = 0
    for frames in (150, 450):
        carry = advance(carry, frames - frames_done)
        frames_done = frames
        mid = carry[0]
        ref_m = jax.jit(jax.vmap(
            lambda x, y, yaw, sc: render_cameras(x, y, yaw, sc, sim_cfg)
        ))(mid.ego.x, mid.ego.y, mid.ego.yaw, mid.scene)
        full_m = jax.jit(lambda: render_cameras_pallas(
            mid.ego.x, mid.ego.y, mid.ego.yaw, mid.scene, sim_cfg,
            n_boxes=sim_cfg.max_static_vehicles))()
        for name, tol in (("rgb", 1e-5), ("depth", 1e-4)):
            err = np.abs(np.asarray(full_m[name], np.float32)
                         - np.asarray(ref_m[name], np.float32)).max()
            if err > tol:
                raise AssertionError(
                    f"Pallas renderer (no cull, {frames}-frame mid-maneuver) "
                    f"diverges: {name} max|diff|={err:.3e} (tol {tol})")
        culled_m = jax.jit(lambda: render_cameras_pallas(
            mid.ego.x, mid.ego.y, mid.ego.yaw, mid.scene, sim_cfg))()
        frac_m = float((np.abs(np.asarray(culled_m["rgb"], np.float32)
                               - np.asarray(ref_m["rgb"], np.float32)).max(-1)
                        > 1e-3).mean())
        if frac_m > 0.02:
            raise AssertionError(
                f"cull LOD error out of budget at {frames}-frame mid-maneuver "
                f"poses: {frac_m:.2%} of pixels differ")


def main():
    n_envs = int(os.environ.get("BENCH_ENVS", "256"))
    n_steps = 30
    carry, run = build_bench(n_envs, render=True)

    # compile + warm up; float() forces a device->host fetch (a plain
    # block_until_ready is not a reliable fence over the remote tunnel)
    carry2 = run(carry, n_steps)
    _ = float(carry2[2])

    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        carry2 = run(carry2, n_steps)
    _ = float(carry2[2])
    dt = time.perf_counter() - t0

    steps = n_envs * n_steps * iters
    steps_per_sec = steps / dt

    # correctness gate (after timing so its compiles don't perturb it)
    check_render_correctness()
    every = os.environ.get("BENCH_RENDER_EVERY", "1")
    metric = ("env steps/sec/chip (4-cam 256x256 render + dynamics + expert)"
              if every == "1" else
              f"env steps/sec/chip (render every {every} frames: policy rate)")
    print(json.dumps({
        "metric": metric,
        "value": round(steps_per_sec, 1),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
