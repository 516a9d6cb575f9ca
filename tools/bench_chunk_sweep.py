"""Hardware A/B for the env-chunked render kernel (round-4 item 1).

Sweeps env_chunk (envs per grid cell) x bands at the shipped defaults,
methodology identical to bench.py: jitted lax.scan over a 256-env fleet,
full-pixel reduction through the carry, host fetch as the fence.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp

N_ENVS = int(os.environ.get("PROF_ENVS", "256"))
N_STEPS = 30
ITERS = 3


def timeit(run, carry):
    c = run(carry, N_STEPS)
    _ = float(c[2])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        c = run(c, N_STEPS)
    _ = float(c[2])
    dt = time.perf_counter() - t0
    steps = N_ENVS * N_STEPS * ITERS
    return dt / steps * 1e6, steps / dt


def build(render_kwargs):
    from e2e_parking_carla_tpu.config import EvalConfig, SimConfig
    from e2e_parking_carla_tpu.ops.render import render_cameras_pallas
    from e2e_parking_carla_tpu.sim import scene as scene_lib
    from e2e_parking_carla_tpu.sim.env import reset_env, step_env
    from e2e_parking_carla_tpu.sim.expert import ExpertState, expert_policy

    sim_cfg, eval_cfg = SimConfig(), EvalConfig()
    goals = jnp.asarray(scene_lib.EVAL_GOAL_INDICES)
    key = jax.random.PRNGKey(0)
    targets = goals[jax.random.randint(key, (N_ENVS,), 0, len(goals))]
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(scene_lib.datagen_start_pose)(
        jax.random.split(key, N_ENVS), goal_y)
    states = jax.vmap(reset_env)(
        jax.random.split(jax.random.PRNGKey(1), N_ENVS), targets, xs, ys, yaws)
    est = ExpertState.init((N_ENVS,))

    def body(carry, i):
        s, e, acc = carry
        ctrl, e = jax.vmap(lambda a, b, c: expert_policy(a, b, c, sim_cfg))(
            s.ego, s.scene, e)
        s = jax.vmap(lambda st, c: step_env(st, c, sim_cfg, eval_cfg))(s, ctrl)
        cams = render_cameras_pallas(
            s.ego.x, s.ego.y, s.ego.yaw, s.scene, sim_cfg, **render_kwargs)
        sink = jnp.sum(cams["rgb"]) + jnp.sum(cams["depth"])
        return (s, e, acc + sink), None

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(carry, n_steps):
        (s, e, acc), _ = jax.lax.scan(body, carry, jnp.arange(n_steps))
        return (s, e, acc)

    return (states, est, jnp.float32(0.0)), run


def main():
    import json
    import sys
    if len(sys.argv) > 1:
        configs = [json.loads(a) for a in sys.argv[1:]]
        for kw in configs:  # JSON lists -> hashable static args
            if "debug_zero" in kw:
                kw["debug_zero"] = tuple(kw["debug_zero"])
    else:
        configs = [
            {"env_chunk": 1},                 # round-3 shipped shape
            {"env_chunk": 4},
            {"env_chunk": 8},
            {"env_chunk": 16},
            {"env_chunk": 32},
            {"env_chunk": 64},
            {"env_chunk": 16, "bands": 1},
            {"env_chunk": 32, "bands": 1},
            {"env_chunk": 16, "n_sectors": 4},
            {"env_chunk": 32, "n_sectors": 4},
        ]
    for kw in configs:
        try:
            carry, run = build(kw)
            us, sps = timeit(run, carry)
        except Exception as e:  # noqa: BLE001 — e.g. VMEM OOM at big blocks
            print(f"{str(kw):44s} FAILED: {str(e)[:120]}", flush=True)
            continue
        print(f"{str(kw):44s} {us:8.2f} us/env-step {sps:10.1f} steps/s",
              flush=True)


if __name__ == "__main__":
    main()
