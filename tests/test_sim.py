"""Simulator tests: vehicle dynamics, OBB collision, scene sampling, and the
evaluation-state machine (reference semantics per network_evaluator.py /
data_generator.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e2e_parking_carla_tpu.config import EvalConfig, SimConfig
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.collision import obb_overlap, point_in_obb
from e2e_parking_carla_tpu.sim.vehicle import VehicleControl, step_vehicle
from e2e_parking_carla_tpu.sim.env import (
    EgoState,
    EnvState,
    SceneState,
    Status,
    eval_metrics,
    reset_env,
    step_env,
)

SIM = SimConfig()
EVAL = EvalConfig()


def ctrl(throttle=0.0, brake=0.0, steer=0.0, reverse=False):
    return VehicleControl(
        throttle=jnp.float32(throttle),
        brake=jnp.float32(brake),
        steer=jnp.float32(steer),
        reverse=jnp.asarray(reverse),
    )


# ---------------------------------------------------------------------------
# vehicle dynamics
# ---------------------------------------------------------------------------


def drive(n, control, x=0.0, y=0.0, yaw=0.0, v=0.0):
    x, y, yaw, v = jnp.float32(x), jnp.float32(y), jnp.float32(yaw), jnp.float32(v)
    for _ in range(n):
        x, y, yaw, v = step_vehicle(x, y, yaw, v, control, SIM)
    return float(x), float(y), float(yaw), float(v)


def test_throttle_accelerates_forward():
    x, y, yaw, v = drive(30, ctrl(throttle=1.0))
    assert v > 1.0 and x > 0.3 and abs(y) < 1e-5


def test_reverse_gear_moves_backward():
    x, y, yaw, v = drive(30, ctrl(throttle=0.5, reverse=True))
    assert v < -0.5 and x < -0.1


def test_brake_stops_exactly():
    _, _, _, v = drive(60, ctrl(brake=1.0), v=5.0)
    assert v == 0.0


def test_stiction_at_rest():
    x, y, yaw, v = drive(30, ctrl())
    assert v == 0.0 and x == 0.0


def test_weak_throttle_does_not_beat_full_brake():
    _, _, _, v = drive(30, ctrl(throttle=0.5, brake=1.0))
    assert v == 0.0


def test_rolling_resistance_coasts_to_stop():
    _, _, _, v = drive(30 * 60, ctrl(), v=3.0)
    assert v == 0.0


def test_turning_radius():
    # steady-state circle: R = wheelbase / tan(max_steer)
    c = ctrl(throttle=0.3, steer=1.0)
    x, y, yaw, v = 0.0, 0.0, 0.0, 2.0
    xs, ys = [], []
    for _ in range(30 * 30):
        x, y, yaw, v = step_vehicle(
            jnp.float32(x), jnp.float32(y), jnp.float32(yaw), jnp.float32(v), c, SIM)
        xs.append(float(x)); ys.append(float(y))
    r_expected = SIM.wheelbase / np.tan(SIM.max_steer_rad)
    # fit circle radius from the trajectory extent
    xs, ys = np.array(xs[300:]), np.array(ys[300:])
    cx, cy = xs.mean(), ys.mean()
    r = np.sqrt((xs - cx) ** 2 + (ys - cy) ** 2).mean()
    assert abs(r - r_expected) / r_expected < 0.1


def test_positive_steer_turns_toward_positive_y():
    # x fwd / y right / yaw toward +y: steer>0 (right) increases yaw
    _, y, yaw, _ = drive(60, ctrl(throttle=0.5, steer=0.5))
    assert yaw > 0.05 and y > 0.0


def test_speed_clamped():
    _, _, _, v = drive(30 * 60, ctrl(throttle=1.0))
    assert v <= SIM.max_speed + 1e-5


# ---------------------------------------------------------------------------
# collision
# ---------------------------------------------------------------------------


def test_obb_overlap_basic():
    half = jnp.array([2.0, 1.0])
    assert bool(obb_overlap(jnp.zeros(2), 0.0, half, jnp.array([3.0, 0.0]), 0.0, half))
    assert not bool(obb_overlap(jnp.zeros(2), 0.0, half, jnp.array([4.5, 0.0]), 0.0, half))
    assert not bool(obb_overlap(jnp.zeros(2), 0.0, half, jnp.array([0.0, 2.5]), 0.0, half))


def test_obb_overlap_rotated():
    half = jnp.array([2.0, 1.0])
    # boxes at right angles: corner overlap cases
    assert bool(obb_overlap(jnp.zeros(2), 0.0, half, jnp.array([2.5, 0.0]), jnp.pi / 2, half))
    assert not bool(obb_overlap(jnp.zeros(2), 0.0, half, jnp.array([3.2, 0.0]), jnp.pi / 2, half))
    # diagonal separating axis: only SAT (not AABB) gets this right
    a45 = jnp.pi / 4
    assert not bool(obb_overlap(jnp.zeros(2), a45, jnp.array([1.0, 0.2]),
                                jnp.array([1.7, -1.7]), a45, jnp.array([1.0, 0.2])))


def test_point_in_obb():
    half = jnp.array([2.0, 1.0])
    pts = jnp.array([[0.0, 0.0], [1.9, 0.9], [2.1, 0.0], [0.0, 1.1]])
    res = np.asarray(point_in_obb(pts, jnp.zeros(2), 0.0, half))
    np.testing.assert_array_equal(res, [True, True, False, False])
    # rotated 90deg: extents swap
    res90 = np.asarray(point_in_obb(pts, jnp.zeros(2), jnp.pi / 2, half))
    np.testing.assert_array_equal(res90, [True, False, False, True])


# ---------------------------------------------------------------------------
# scene sampling
# ---------------------------------------------------------------------------


def test_slot_map_matches_reference():
    assert scene_lib.SLOT_XY.shape == (64, 2)
    np.testing.assert_allclose(scene_lib.SLOT_XY[17], [290.9, -232.73])  # 2-2
    np.testing.assert_allclose(scene_lib.SLOT_XY[16], [290.9, -235.73])  # 2-1
    np.testing.assert_allclose(scene_lib.SLOT_XY[47], [280.0, -188.20])  # 3-16
    assert list(scene_lib.EVAL_GOAL_INDICES[:3]) == [16, 18, 20]
    assert scene_lib.EVAL_SLOT_IDS[0] == "2-1" and scene_lib.EVAL_SLOT_IDS[-1] == "3-15"


def test_sample_scene_properties():
    for seed in range(5):
        occ, yaw, free = scene_lib.sample_scene(jax.random.PRNGKey(seed), 16)
        occ, free = np.asarray(occ), np.asarray(free)
        assert not occ[16]  # target always free
        assert free[16]
        count = occ.sum()
        assert 21 - 1 <= count <= 63  # one may be lost to the target slot
        np.testing.assert_array_equal(free, ~occ)
        yaw_set = {round(float(v), 5) for v in np.asarray(yaw)}
        assert yaw_set <= {0.0, round(float(np.float32(np.pi)), 5)}


def test_eval_start_pose_sweep():
    goal_y = -220.23
    x0, y0, yaw0 = scene_lib.eval_start_pose(goal_y, 0, 6)
    x5, y5, yaw5 = scene_lib.eval_start_pose(goal_y, 5, 6)
    assert float(y0) == pytest.approx(goal_y - 8.0)
    assert float(y5) == pytest.approx(goal_y + 8.0)
    assert float(yaw0) == pytest.approx(np.pi / 2)  # first half: heading +90
    assert float(yaw5) == pytest.approx(-np.pi / 2)


def test_datagen_start_pose_in_range():
    for seed in range(10):
        x, y, yaw = scene_lib.datagen_start_pose(jax.random.PRNGKey(seed), -220.23)
        assert -228.23 <= float(y) <= -212.23
        # heading toward the goal, with up to +-4 deg of jitter
        expected = np.pi / 2 if float(y) < -220.23 else -np.pi / 2
        assert abs(float(yaw) - expected) <= np.radians(4.0) + 1e-6
        # lateral jitter within +-0.6 m of the aisle line
        assert abs(float(x) - scene_lib.EGO_START_X) <= 0.6 + 1e-6

    # zero-noise mode reproduces the reference's exact sweep
    x, y, yaw = scene_lib.datagen_start_pose(
        jax.random.PRNGKey(0), -220.23, lat_noise=0.0, yaw_noise_deg=0.0)
    assert float(x) == pytest.approx(scene_lib.EGO_START_X, abs=1e-5)


# ---------------------------------------------------------------------------
# env state machine
# ---------------------------------------------------------------------------


def make_env(target_idx=16, ego_x=None, ego_y=None, ego_yaw=np.pi, npc_slots=()):
    """Hand-built env: NPCs only at npc_slots, everything else free."""
    slot = scene_lib.SLOT_XY[target_idx]
    npc_valid = np.zeros(64, bool)
    for s in npc_slots:
        npc_valid[s] = True
    state = EnvState(
        ego=EgoState(
            x=jnp.float32(slot[0] if ego_x is None else ego_x),
            y=jnp.float32(slot[1] if ego_y is None else ego_y),
            yaw=jnp.float32(ego_yaw),
            v=jnp.float32(0.0),
            acc_x=jnp.float32(0.0),
            acc_y=jnp.float32(0.0),
        ),
        scene=SceneState(
            npc_valid=jnp.asarray(npc_valid),
            npc_yaw=jnp.zeros(64, jnp.float32),
            goal_free=jnp.asarray(~npc_valid),
            target_idx=jnp.int32(target_idx),
        ),
        frames_total=jnp.int32(0),
        frames_in_goal=jnp.int32(0),
        frames_nearby_goal=jnp.int32(0),
        frames_nearby_no_goal=jnp.int32(0),
        frames_outbound=jnp.int32(0),
        status=jnp.int32(Status.RUNNING),
        final_pos_err=jnp.float32(0.0),
        final_orient_err=jnp.float32(0.0),
        final_time=jnp.float32(0.0),
    )
    return state


def run_steps(state, control, n):
    step = jax.jit(lambda s, c: step_env(s, c, SIM, EVAL))
    for _ in range(n):
        state = step(state, control)
    return state


def test_target_success():
    # ego parked dead-center in the target slot, stopped in reverse gear
    state = make_env(target_idx=16, ego_yaw=np.pi)
    state = run_steps(state, ctrl(reverse=True), 62)
    assert int(state.status) == Status.TARGET_SUCCESS
    assert float(state.final_pos_err) < 0.01
    assert float(state.final_orient_err) < 0.01
    # fires at frame 61: counter must exceed 60 (reference uses strict >)
    assert float(state.final_time) == pytest.approx(61 / 30, abs=1e-4)


def test_no_success_without_reverse_gear():
    state = make_env(target_idx=16)
    state = run_steps(state, ctrl(reverse=False), 120)
    assert int(state.status) == Status.RUNNING


def test_no_target_success():
    # parked in a free slot that is NOT the target
    state = make_env(target_idx=16, ego_x=scene_lib.SLOT_XY[18][0],
                     ego_y=scene_lib.SLOT_XY[18][1])
    state = run_steps(state, ctrl(reverse=True), 62)
    assert int(state.status) == Status.NO_TARGET_SUCCESS


def test_target_fail_nearby():
    # 1.5 m off in x: inside the 2x near-miss box but outside the success box
    slot = scene_lib.SLOT_XY[16]
    state = make_env(target_idx=16, ego_x=slot[0] + 1.5, ego_y=slot[1])
    state = run_steps(state, ctrl(reverse=True), 62)
    assert int(state.status) == Status.TARGET_FAIL


def test_orientation_gate():
    # in position but 15 deg off: fails the 10-deg gate, lands in near-miss
    state = make_env(target_idx=16, ego_yaw=np.pi + np.radians(15))
    state = run_steps(state, ctrl(reverse=True), 62)
    assert int(state.status) == Status.TARGET_FAIL


def test_collision():
    # NPC parked in slot 17 (3 m from slot 16 center): drive into it
    slot16 = scene_lib.SLOT_XY[16]
    state = make_env(target_idx=18, ego_x=slot16[0], ego_y=slot16[1] + 0.0,
                     ego_yaw=np.pi / 2, npc_slots=(17,))
    state = run_steps(state, ctrl(throttle=0.8), 90)
    assert int(state.status) == Status.COLLISION


def test_timeout():
    state = make_env(target_idx=16, ego_x=285.6, ego_y=-220.0, ego_yaw=np.pi / 2)
    state = run_steps(state, ctrl(), 902)
    assert int(state.status) == Status.TIMEOUT
    assert int(state.frames_total) == 901  # frozen at the terminal frame


def test_outbound():
    # start just inside the boundary heading out
    state = make_env(target_idx=16, ego_x=303.0, ego_y=-220.0, ego_yaw=0.0)
    state = run_steps(state, ctrl(throttle=1.0), 400)
    assert int(state.status) == Status.OUTBOUND


def test_terminal_state_freezes():
    state = make_env(target_idx=16)
    state = run_steps(state, ctrl(reverse=True), 62)
    frozen = run_steps(state, ctrl(throttle=1.0), 10)
    assert int(frozen.status) == Status.TARGET_SUCCESS
    assert float(frozen.ego.x) == float(state.ego.x)
    assert int(frozen.frames_total) == int(state.frames_total)


def test_reset_env_and_vmap_step():
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    targets = jnp.asarray(scene_lib.EVAL_GOAL_INDICES[:4])
    goal_y = jnp.asarray(scene_lib.SLOT_XY)[targets, 1]
    xs, ys, yaws = jax.vmap(scene_lib.eval_start_pose, in_axes=(0, None, None))(
        goal_y, 0, 6)
    states = jax.vmap(reset_env)(keys, targets, xs, ys, yaws)
    assert states.ego.x.shape == (4,)
    batched_ctrl = VehicleControl(
        throttle=jnp.full((4,), 0.5), brake=jnp.zeros(4),
        steer=jnp.zeros(4), reverse=jnp.zeros(4, bool))
    step = jax.jit(jax.vmap(lambda s, c: step_env(s, c, SIM, EVAL)))
    out = step(states, batched_ctrl)
    assert float(out.ego.v[0]) > 0
    np.testing.assert_array_equal(np.asarray(out.frames_total), 1)


def test_eval_metrics():
    # fabricate terminal statuses
    base = make_env()
    states = jax.tree.map(lambda x: jnp.stack([x] * 8), base)
    status = jnp.array([1, 1, 1, 2, 3, 4, 5, 7], jnp.int32)
    states = states.replace(
        status=status,
        final_pos_err=jnp.where(status == 1, 0.3, 0.0),
        final_orient_err=jnp.where(status == 1, 0.9, 0.0),
        final_time=jnp.where(status == 1, 15.0, 0.0),
    )
    m = jax.tree.map(float, eval_metrics(states, EVAL))
    assert m["TSR"] == pytest.approx(3 / 8 * 100)
    assert m["TFR"] == pytest.approx(1 / 8 * 100)
    assert m["NTSR"] == pytest.approx(1 / 8 * 100)
    assert m["CR"] == pytest.approx(1 / 8 * 100)
    assert m["TR"] == pytest.approx(1 / 8 * 100)
    assert m["OR"] == 0.0
    assert m["APE"] == pytest.approx(0.3, abs=1e-6)
    assert m["AOE"] == pytest.approx(0.9, abs=1e-6)
    assert m["APT"] == pytest.approx(15.0, abs=1e-5)
