"""Decompose the every-frame bench cost on hardware.

Times the full env step (render + dynamics + expert) and ablated variants
(no render, no slot lines, no box loop, cull only) on the current chip to
attribute microseconds per env-step to each kernel stage. Methodology is
bench.py's: jitted lax.scan over a 256-env fleet, full-pixel reduction
through the carry, host fetch as the fence.
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
    return dt / steps * 1e6, steps / dt  # us/env-step, steps/s


def build(render_fn):
    from e2e_parking_carla_tpu.config import EvalConfig, SimConfig
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
        sink = render_fn(s, sim_cfg)
        return (s, e, acc + sink), None

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(carry, n_steps):
        (s, e, acc), _ = jax.lax.scan(body, carry, jnp.arange(n_steps))
        return (s, e, acc)

    return (states, est, jnp.float32(0.0)), run


def main():
    from e2e_parking_carla_tpu.ops import render as render_mod
    from e2e_parking_carla_tpu.ops.render import (_cull_pallas,
                                                  render_cameras_pallas)

    results = {}

    def full(s, sim_cfg, **kw):
        cams = render_cameras_pallas(
            s.ego.x, s.ego.y, s.ego.yaw, s.scene, sim_cfg, **kw)
        return jnp.sum(cams["rgb"]) + jnp.sum(cams["depth"])

    variants = {
        "full (default)": lambda s, cfg: full(s, cfg),
        "no_render": lambda s, cfg: s.ego.x.sum(),
        "cull_only": lambda s, cfg: _cull_pallas(
            s.ego.x, s.ego.y, s.ego.yaw, s.scene, cfg, 3, 8, False
        )[1].sum(),
        "boxes=1": lambda s, cfg: full(s, cfg, n_boxes=1),
        "unpacked": lambda s, cfg: full(s, cfg, packed=False),
        "xla_cull": lambda s, cfg: full(s, cfg, cull="xla"),
    }

    # stub variants via monkeypatch (trace-time global lookup)
    orig_line = render_mod._line_intensity

    for name, fn in variants.items():
        carry, run = build(fn)
        us, sps = timeit(run, carry)
        results[name] = (us, sps)
        print(f"{name:18s} {us:8.2f} us/env-step   {sps:10.1f} steps/s",
              flush=True)

    # no slot lines: zero-out the analytic line marking
    render_mod._line_intensity = lambda px, py: jnp.zeros_like(px)
    render_mod._render_cameras_pallas._clear_cache()
    try:
        carry, run = build(lambda s, cfg: full(s, cfg))
        us, sps = timeit(run, carry)
        results["no_lines"] = (us, sps)
        print(f"{'no_lines':18s} {us:8.2f} us/env-step   {sps:10.1f} steps/s",
              flush=True)
    finally:
        render_mod._line_intensity = orig_line
        render_mod._render_cameras_pallas._clear_cache()

    base = results["full (default)"][0]
    print("\nattribution (vs full):")
    for name, (us, _) in results.items():
        print(f"  {name:18s} delta {base - us:+7.2f} us")


if __name__ == "__main__":
    main()
