"""A/B sweep of the Pallas renderer's elevation-band split on real hardware.

The band split (ops/render.py `bands`) trades static box/ground culling
against an n_bands-times larger Pallas grid of n_bands-times smaller
blocks. Its win is workload-dependent, so this sweeps bands in {0, 2, 4, 8}
under the exact bench.py fleet workload (expert + dynamics + every-frame
render) and reports env steps/s for each.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_render_ab.py
"""

import functools
import os
import time

import jax
import jax.numpy as jnp


def main():
    from e2e_parking_carla_tpu.config import EvalConfig, SimConfig
    from e2e_parking_carla_tpu.ops.render import render_cameras_pallas
    from e2e_parking_carla_tpu.sim import scene as scene_lib
    from e2e_parking_carla_tpu.sim.env import reset_env, step_env
    from e2e_parking_carla_tpu.sim.expert import ExpertState, expert_policy

    sim_cfg, eval_cfg = SimConfig(), EvalConfig()
    n_envs, n_steps = 1024, 200

    goals = jnp.asarray(scene_lib.EVAL_GOAL_INDICES)
    key = jax.random.PRNGKey(0)
    targets = goals[jax.random.randint(key, (n_envs,), 0, len(goals))]
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(scene_lib.datagen_start_pose)(
        jax.random.split(key, n_envs), goal_y)
    states = jax.vmap(reset_env)(
        jax.random.split(jax.random.PRNGKey(1), n_envs), targets, xs, ys, yaws)
    est = ExpertState.init((n_envs,))

    def make_run(bands, packed, cull, sectors=8):
        def body(carry, _):
            s, e, acc = carry
            ctrl, e = jax.vmap(lambda a, b, c: expert_policy(a, b, c, sim_cfg))(
                s.ego, s.scene, e)
            s = jax.vmap(lambda st, c: step_env(st, c, sim_cfg, eval_cfg))(s, ctrl)
            cams = render_cameras_pallas(
                s.ego.x, s.ego.y, s.ego.yaw, s.scene, sim_cfg,
                bands=bands, packed=packed, cull=cull, n_sectors=sectors)
            sink = jnp.sum(cams["rgb"]) + jnp.sum(cams["depth"])
            return (s, e, acc + sink), None

        @functools.partial(jax.jit, static_argnums=(1,))
        def run(carry, n):
            (s, e, acc), _ = jax.lax.scan(body, carry, jnp.arange(n))
            return (s, e, acc)

        return run

    if os.environ.get("AB_SECTORS"):
        # sector-count sweep: azimuth-cull granularity vs grid-cell count
        # (the (bands, packed, cull) winner is fixed at the shipped default;
        # the 8-sector row IS the shipped default, giving an in-run baseline)
        configs = [("pallas", 2, True, sec) for sec in (4, 8, 16)] + [
            ("pallas", 4, True, 4)]
    else:
        configs = [
            ("pallas", 2, True, 8), ("pallas", 0, True, 8),
            ("pallas", 4, True, 8), ("pallas", 8, True, 8),
            ("pallas", 2, False, 8), ("pallas", 0, False, 8),
            ("xla", 2, True, 8), ("xla", 0, True, 8), ("xla", 2, False, 8)]
    for cull, bands, packed, sectors in configs:
        run = make_run(bands, packed, cull, sectors)
        carry = (states, est, jnp.float32(0.0))
        carry = run(carry, n_steps)                # compile + warm
        float(carry[2])                            # fence
        t0 = time.perf_counter()
        out = run(carry, n_steps)                  # warmed carry: fresh inputs
        sink = float(out[2])                       # host fetch = fence
        dt = time.perf_counter() - t0
        print(f"cull={cull} bands={bands} packed={int(packed)} sec={sectors}: "
              f"{n_envs * n_steps / dt:,.0f} env steps/s "
              f"(sink {sink:.3e})", flush=True)


if __name__ == "__main__":
    main()
