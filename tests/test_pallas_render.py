"""Pallas renderer vs the pure-JAX reference implementation (interpret mode
on CPU; the real kernel path runs in bench.py on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp

from e2e_parking_carla_tpu.config import SimConfig
from e2e_parking_carla_tpu.ops.render import render_cameras_pallas
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.camera import render_cameras
from e2e_parking_carla_tpu.sim.env import SceneState, reset_env

SIM = SimConfig(cam_width=64, cam_height=64)


def sample_envs(n=2):
    keys = jax.random.split(jax.random.PRNGKey(4), n)
    targets = jnp.asarray(scene_lib.EVAL_GOAL_INDICES[:n])
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(scene_lib.eval_start_pose, in_axes=(0, None, None))(
        goal_y, 1, 6)
    return jax.vmap(reset_env)(keys, targets, xs, ys, yaws)


def test_pallas_matches_pure_renderer():
    st = sample_envs(2)
    weather = jnp.array([0, 3], jnp.int32)

    pure = jax.vmap(
        lambda x, y, yaw, sc, w: render_cameras(x, y, yaw, sc, SIM, w)
    )(st.ego.x, st.ego.y, st.ego.yaw, st.scene, weather)

    fused = render_cameras_pallas(
        st.ego.x, st.ego.y, st.ego.yaw, st.scene, SIM, weather,
        n_boxes=64, interpret=True)  # K=64: no culling, exact comparison

    rgb_a, rgb_b = np.asarray(pure["rgb"]), np.asarray(fused["rgb"])
    assert rgb_a.shape == rgb_b.shape == (2, 4, 64, 64, 3)
    # allow a small fraction of boundary pixels to differ (float order)
    mismatch = (np.abs(rgb_a - rgb_b) > 1e-3).mean()
    assert mismatch < 0.002, f"rgb mismatch fraction {mismatch}"

    d_a, d_b = np.asarray(pure["depth"]), np.asarray(fused["depth"])
    close = np.isclose(d_a, d_b, rtol=1e-3, atol=1e-2)
    assert close.mean() > 0.998, f"depth mismatch {1 - close.mean()}"

    s_a, s_b = np.asarray(pure["sem"]), np.asarray(fused["sem"])
    assert (s_a == s_b).mean() > 0.998


def test_pallas_culling_keeps_near_field():
    """K=16 culling must not change pixels of nearby vehicles."""
    st = sample_envs(1)
    full = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                 SIM, n_boxes=64, interpret=True)
    culled = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                   SIM, n_boxes=16, interpret=True)
    d_full = np.asarray(full["depth"])
    d_cull = np.asarray(culled["depth"])
    near = d_full < 15.0  # within the depth-supervision range
    np.testing.assert_allclose(d_cull[near], d_full[near], rtol=1e-3, atol=1e-2)


def test_training_lod_budget_mid_maneuver():
    """ADVICE r2 #5: the training/eval default (n_boxes=3) is LOD-
    approximate; verify the approximation stays inside a small budget at
    MID-MANEUVER poses (stepped under the expert), not just start poses.
    Measured on the full rig (256^2, 64 envs): 1.7% of vehicle pixels
    dropped on average, 3.9% worst frame, all far-field."""
    from e2e_parking_carla_tpu.config import EvalConfig
    from e2e_parking_carla_tpu.sim.env import step_env
    from e2e_parking_carla_tpu.sim.expert import ExpertState, expert_policy

    st = sample_envs(2)
    est = ExpertState.init((2,))
    ev = EvalConfig()

    @jax.jit
    def advance(s, e):
        def body(carry, _):
            s_, e_ = carry
            ctrl, e_ = jax.vmap(lambda a, b, c: expert_policy(a, b, c, SIM))(
                s_.ego, s_.scene, e_)
            s2 = jax.vmap(lambda x, c: step_env(x, c, SIM, ev))(s_, ctrl)
            return (s2, e_), None
        (s_out, e_out), _ = jax.lax.scan(body, (s, e), None, length=150)
        return s_out, e_out

    worst = 0.0
    for hop in range(3):  # poses at 5 s, 10 s, 15 s into the maneuver
        st, est = advance(st, est)
        full = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                     SIM, n_boxes=64, interpret=True)
        lod = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                    SIM, n_boxes=3, interpret=True)
        veh_full = np.asarray(full["sem"]) == 1
        veh_lod = np.asarray(lod["sem"]) == 1
        dropped = (veh_full & ~veh_lod).sum() / max(veh_full.sum(), 1)
        worst = max(worst, float(dropped))
        # near field must be exact: any dropped vehicle pixel is far away
        d_full = np.asarray(full["depth"])
        near = d_full < 10.0
        np.testing.assert_array_equal(veh_lod[near], veh_full[near])
    # At this 64^2 test resolution the sector fallback (4 sectors vs 8 at
    # the training 256^2) widens each sector's candidate pool, so the K=3
    # far-field drop fraction runs higher than production: measured 1.7%
    # avg / 3.9% worst at 256^2 (the near-field exactness above is the
    # safety property; the budget here just catches gross cull regressions)
    assert worst < 0.12, f"LOD drops {worst:.1%} of vehicle pixels"


def test_elevation_bands_are_exact():
    """Elevation-band splitting (128^2 -> 2 bands here, 8 at 256^2) must be
    output-invariant: the static z-slab window test is conservative, so the
    banded kernel renders bit-identically to the unbanded one."""
    sim = SimConfig(cam_width=128, cam_height=128)
    keys = jax.random.split(jax.random.PRNGKey(9), 2)
    targets = jnp.asarray(scene_lib.EVAL_GOAL_INDICES[:2])
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(scene_lib.eval_start_pose, in_axes=(0, None, None))(
        goal_y, 1, 6)
    st = jax.vmap(reset_env)(keys, targets, xs, ys, yaws)

    banded = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                   sim, n_boxes=3, interpret=True, bands=8)
    flat = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                 sim, n_boxes=3, interpret=True, bands=0)
    np.testing.assert_array_equal(np.asarray(banded["sem"]),
                                  np.asarray(flat["sem"]))
    np.testing.assert_array_equal(np.asarray(banded["depth"]),
                                  np.asarray(flat["depth"]))
    np.testing.assert_array_equal(np.asarray(banded["rgb"]),
                                  np.asarray(flat["rgb"]))


def test_cull_backends_agree():
    """The fused Pallas cull (one selection kernel) must reproduce the
    plain-XLA selection: identical rendered images at the LOD default and
    with culling disabled (K=64). The two paths share the same conservative
    test and tie-break semantics; only ulp-level rounding at the decision
    boundary may differ, which fixed test scenes sit nowhere near."""
    st = sample_envs(2)
    weather = jnp.array([0, 3], jnp.int32)
    for k in (3, 64):
        a = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                  SIM, weather, n_boxes=k, interpret=True,
                                  cull="pallas")
        b = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                  SIM, weather, n_boxes=k, interpret=True,
                                  cull="xla")
        for f in ("rgb", "depth", "sem"):
            np.testing.assert_array_equal(
                np.asarray(a[f]), np.asarray(b[f]),
                err_msg=f"cull backends diverge on {f} at K={k}")


def test_cull_backends_agree_mid_maneuver_banded():
    """Same equivalence at mid-maneuver poses (near-field boxes stress the
    cull hardest) and with elevation bands on (bands consume the cull's
    per-candidate distances)."""
    from e2e_parking_carla_tpu.config import EvalConfig
    from e2e_parking_carla_tpu.sim.env import step_env
    from e2e_parking_carla_tpu.sim.expert import ExpertState, expert_policy

    sim = SimConfig(cam_width=128, cam_height=128)
    st = sample_envs(2)
    est = ExpertState.init((2,))
    ev = EvalConfig()

    @jax.jit
    def advance(s, e):
        def body(carry, _):
            s_, e_ = carry
            ctrl, e_ = jax.vmap(lambda a, b, c: expert_policy(a, b, c, sim))(
                s_.ego, s_.scene, e_)
            s2 = jax.vmap(lambda x, c: step_env(x, c, sim, ev))(s_, ctrl)
            return (s2, e_), None
        (s_out, e_out), _ = jax.lax.scan(body, (s, e), None, length=300)
        return s_out, e_out

    st, est = advance(st, est)
    a = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                              sim, n_boxes=3, interpret=True, bands=8,
                              cull="pallas")
    b = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                              sim, n_boxes=3, interpret=True, bands=8,
                              cull="xla")
    for f in ("rgb", "depth", "sem"):
        np.testing.assert_array_equal(
            np.asarray(a[f]), np.asarray(b[f]),
            err_msg=f"cull backends diverge on {f} mid-maneuver")


def test_packed_and_unpacked_outputs_agree():
    """The packed int32 RGB+sem output and the round-2 five-plane layout
    must agree: sem and depth exactly, color within the 8-bit quantization
    the packed path applies (the unpacked path writes raw f32)."""
    sim = SimConfig(cam_width=64, cam_height=64)
    keys = jax.random.split(jax.random.PRNGKey(11), 2)
    targets = jnp.asarray(scene_lib.EVAL_GOAL_INDICES[:2])
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(scene_lib.eval_start_pose, in_axes=(0, None, None))(
        goal_y, 2, 6)
    st = jax.vmap(reset_env)(keys, targets, xs, ys, yaws)

    a = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                              sim, n_boxes=3, interpret=True, packed=True)
    b = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                              sim, n_boxes=3, interpret=True, packed=False)
    np.testing.assert_array_equal(np.asarray(a["sem"]), np.asarray(b["sem"]))
    np.testing.assert_array_equal(np.asarray(a["depth"]),
                                  np.asarray(b["depth"]))
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               atol=0.5 / 255.0 + 1e-6)


def test_env_chunking_is_exact():
    """env_chunk (envs rendered per grid cell, round-4 throughput lever) must
    be output-invariant: the chunked kernel runs the identical per-env math
    in an in-kernel fori_loop, so any chunk size renders bit-identically to
    chunk 1. Also covers the non-divisor clamp (env_chunk=3 on E=4 -> 2)."""
    st = sample_envs(4)
    weather = jnp.array([0, 3, 1, 2], jnp.int32)
    base = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                 SIM, weather, n_boxes=3, interpret=True,
                                 env_chunk=1)
    for ec in (2, 3, 4, 16):  # 3 clamps to 2; 16 clamps to E=4
        out = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                    SIM, weather, n_boxes=3, interpret=True,
                                    env_chunk=ec)
        for f in ("rgb", "depth", "sem"):
            np.testing.assert_array_equal(
                np.asarray(base[f]), np.asarray(out[f]),
                err_msg=f"env_chunk={ec} diverges on {f}")


def test_env_chunking_exact_banded_no_cull():
    """Chunking composes with elevation bands and the cull-off (K=64) path."""
    st = sample_envs(2)
    a = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                              SIM, n_boxes=64, interpret=True, bands=2,
                              env_chunk=1)
    b = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                              SIM, n_boxes=64, interpret=True, bands=2,
                              env_chunk=2)
    for f in ("rgb", "depth", "sem"):
        np.testing.assert_array_equal(np.asarray(a[f]), np.asarray(b[f]),
                                      err_msg=f"banded chunking diverges: {f}")


def test_env_unroll_and_box_switch_are_exact():
    """The statically-unrolled env loop (round-4 default) and every
    occupancy-switch shape must render bit-identically to the fori_loop /
    nested-cond forms — extra candidates are invalid no-ops (run_k)."""
    st = sample_envs(4)
    base = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                 SIM, n_boxes=3, interpret=True,
                                 env_chunk=2, unroll_envs=False,
                                 box_switch="nested", skip_sky=True)
    for kw in ({"unroll_envs": True},
               {"box_switch": "single"},
               {"box_switch": "always"},
               {"skip_sky": False},
               {"unroll_envs": True, "box_switch": "always",
                "skip_sky": False}):
        out = render_cameras_pallas(
            st.ego.x, st.ego.y, st.ego.yaw, st.scene, SIM, n_boxes=3,
            interpret=True, env_chunk=2,
            **{"unroll_envs": False, "box_switch": "nested",
               "skip_sky": True, **kw})
        for f in ("rgb", "depth", "sem"):
            np.testing.assert_array_equal(
                np.asarray(base[f]), np.asarray(out[f]),
                err_msg=f"{kw} diverges on {f}")


def test_raw_out_word_roundtrip():
    """raw_out=True returns the packed int32 word plane (the native
    consumption format, 8 B/px with depth); unpack_rgb_word must decode it
    to exactly the rgb/sem the default path returns."""
    from e2e_parking_carla_tpu.ops.render import unpack_rgb_word

    st = sample_envs(2)
    full = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                 SIM, n_boxes=3, interpret=True)
    raw = render_cameras_pallas(st.ego.x, st.ego.y, st.ego.yaw, st.scene,
                                SIM, n_boxes=3, interpret=True, raw_out=True)
    assert set(raw) == {"word", "depth"}
    rgb, sem = unpack_rgb_word(raw["word"])
    np.testing.assert_array_equal(np.asarray(sem), np.asarray(full["sem"]))
    np.testing.assert_array_equal(np.asarray(raw["depth"]),
                                  np.asarray(full["depth"]))
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(full["rgb"]),
                               atol=1e-6)
