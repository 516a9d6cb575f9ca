"""Mirror augmentation (TrainConfig.mirror_aug) correctness.

The augmentation claims an EXACT identity: the observation of the
mirrored world through the standard camera rig equals the left<->right
camera swap + horizontal pixel flip of the original observation, and the
mirrored expert label is the negated steer. That rests on three facts,
each tested here:

1. the rig is exactly left-right symmetric (geometry.py CAM_RIG) down to
   the per-pixel ray tables (pixel centers at u+0.5 with cx=W/2 make the
   column offsets a sign-symmetric set),
2. the bicycle dynamics mirror-commute: stepping a reflected state with a
   negated steer yields the reflected next state,
3. the tensor bookkeeping in data/rollout.py:mirror_batch — camera
   permutation, flip axes, sign maps, steer retokenization — matches the
   conventions of every producer (camera.py, bev.py, tokens.py).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from e2e_parking_carla_tpu import tokens as tok
from e2e_parking_carla_tpu.config import EvalConfig, ModelConfig, SimConfig
from e2e_parking_carla_tpu.data.rollout import (
    collect_episodes, make_batch, mirror_batch)
from e2e_parking_carla_tpu.mirror import (
    MIRROR_CAM_PERM as _MIRROR_CAM_PERM, STEER_TOKEN_PERM,
    mirror_observation, mirror_sequence)
from e2e_parking_carla_tpu.models.parking_model import ParkingModel
from e2e_parking_carla_tpu.sim import scene as scene_lib
from e2e_parking_carla_tpu.sim.bev import render_bev_seg
from e2e_parking_carla_tpu.sim.camera import camera_rays
from e2e_parking_carla_tpu.sim.env import (
    EgoState, SceneState, VehicleControl, reset_env, step_env)

from tests.test_pipeline import TINY_MODEL, TINY_SIM


def test_rig_is_exactly_mirror_symmetric():
    """dirs[perm(cam)][i, j] == mirror(dirs[cam][i, W-1-j]); same origins."""
    dirs, origins = camera_rays(SimConfig())
    m = np.array([1.0, -1.0, 1.0], np.float32)
    for cam, pcam in enumerate(_MIRROR_CAM_PERM):
        np.testing.assert_allclose(
            dirs[cam][:, ::-1] * m, dirs[pcam], atol=1e-6)
        np.testing.assert_allclose(origins[cam] * m, origins[pcam], atol=0)


def test_dynamics_mirror_commute():
    """step(mirror(s), -steer) == mirror(step(s, steer)) for the ego pose.

    Mirror = reflection across the lot's horizontal midline y -> c - y
    (maps the bound box onto itself), yaw -> -yaw. NPCs are cleared so
    only kinematics + bounds drive the step.
    """
    sim_cfg, eval_cfg = SimConfig(), EvalConfig()
    c = scene_lib.Y_MIN + scene_lib.Y_MAX
    key = jax.random.PRNGKey(3)
    s = reset_env(key, jnp.int32(20), 285.6, -220.0, jnp.float32(1.2))
    no_npc = dataclasses.replace(
        s.scene, npc_valid=jnp.zeros_like(s.scene.npc_valid),
        goal_free=jnp.ones_like(s.scene.goal_free))
    s = dataclasses.replace(
        s, scene=no_npc,
        ego=dataclasses.replace(s.ego, v=jnp.float32(1.7)))
    sm = dataclasses.replace(
        s, ego=dataclasses.replace(
            s.ego, y=c - s.ego.y, yaw=-s.ego.yaw, acc_y=-s.ego.acc_y))

    ctrl = VehicleControl(throttle=jnp.float32(0.6), brake=jnp.float32(0.0),
                          steer=jnp.float32(0.35), reverse=jnp.array(False))
    ctrl_m = dataclasses.replace(ctrl, steer=-ctrl.steer)

    step = jax.jit(lambda st, ct: step_env(st, ct, sim_cfg, eval_cfg))
    for _ in range(30):
        s, sm = step(s, ctrl), step(sm, ctrl_m)
    np.testing.assert_allclose(float(sm.ego.x), float(s.ego.x), atol=1e-4)
    np.testing.assert_allclose(float(sm.ego.y), float(c - s.ego.y), atol=1e-4)
    np.testing.assert_allclose(float(sm.ego.yaw), float(-s.ego.yaw), atol=1e-5)
    np.testing.assert_allclose(float(sm.ego.v), float(s.ego.v), atol=1e-5)
    np.testing.assert_allclose(float(sm.ego.acc_y), float(-s.ego.acc_y),
                               atol=1e-5)


def test_bev_seg_flip_axis_matches_convention():
    """A world that is mirror-symmetric about the ego's longitudinal axis
    must produce a column-flip-symmetric BEV seg — pins the flip axis AND
    its direction (columns grow with +y/rightward, bev.py contract)."""
    # ego heading +x on a slot's y line; the single NPC + target at that
    # slot are fixed points of the mirror
    col = 7
    row = 1  # row x = 290.9, within the 10 m grid of the aisle
    idx = row * 16 + col
    ego_x, ego_y = 285.6, float(scene_lib.SLOT_Y[col])
    npc_valid = jnp.zeros((scene_lib.NUM_SLOTS,), bool).at[idx].set(True)
    scene = SceneState(
        npc_valid=npc_valid,
        npc_yaw=jnp.full((scene_lib.NUM_SLOTS,), jnp.pi),
        goal_free=~npc_valid,
        target_idx=jnp.int32(idx),
    )
    seg = render_bev_seg(jnp.float32(ego_x), jnp.float32(ego_y),
                         jnp.float32(0.0), scene, TINY_MODEL, TINY_SIM)
    seg = np.asarray(seg)
    assert (seg == 1).any() or (seg == 2).any()  # the NPC/target is in view
    np.testing.assert_array_equal(seg, seg[:, ::-1])


def _tiny_batch(mirror_aug=False):
    buf = jax.jit(
        lambda k: collect_episodes(k, 4, TINY_MODEL, TINY_SIM, EvalConfig())
    )(jax.random.PRNGKey(0))
    return jax.jit(
        lambda b, k: make_batch(b, k, 6, TINY_MODEL, TINY_SIM,
                                mirror_aug=mirror_aug)
    )(buf, jax.random.PRNGKey(1))


def test_mirror_batch_involution_and_semantics():
    batch = _tiny_batch()
    full = jnp.ones((6,), bool)
    m1 = mirror_batch(batch, full)
    m2 = mirror_batch(m1, full)
    for k in batch:
        np.testing.assert_allclose(
            np.asarray(m2[k]), np.asarray(batch[k]), atol=1e-6, err_msg=k)

    # semantics of a single application
    np.testing.assert_allclose(
        np.asarray(m1["images"]),
        np.asarray(batch["images"][:, jnp.asarray(_MIRROR_CAM_PERM), :, ::-1]),
        atol=0)
    np.testing.assert_allclose(np.asarray(m1["gt_steer"]),
                               -np.asarray(batch["gt_steer"]), atol=0)
    np.testing.assert_allclose(
        np.asarray(m1["target_point"]),
        np.asarray(batch["target_point"] * jnp.asarray([1.0, -1.0, -1.0])),
        atol=0)
    np.testing.assert_allclose(np.asarray(m1["segmentation"]),
                               np.asarray(batch["segmentation"][:, :, ::-1]),
                               atol=0)
    # the token sequence is the retokenization of the negated steer
    frames = tok.tokenize(jnp.maximum(batch["gt_acc"], 0.0),
                          jnp.maximum(-batch["gt_acc"], 0.0),
                          -batch["gt_steer"],
                          batch["gt_reverse"].astype(jnp.float32))
    expect = tok.build_sequence(frames, batch["gt_control"].shape[-1])
    np.testing.assert_array_equal(np.asarray(m1["gt_control"]),
                                  np.asarray(expect))
    # throttle/brake/reverse token columns are invariant: zero-steer mask
    zero_mask = jnp.zeros((6,), bool)
    m0 = mirror_batch(batch, zero_mask)
    for k in batch:
        np.testing.assert_allclose(np.asarray(m0[k]), np.asarray(batch[k]),
                                   atol=0, err_msg=k)


def test_make_batch_mirror_aug_flag():
    """mirror_aug=True runs jitted end-to-end and actually mirrors ~half."""
    batch = _tiny_batch(mirror_aug=True)
    assert batch["images"].shape[1] == 4
    plain = _tiny_batch(mirror_aug=False)
    assert batch["gt_control"].shape == plain["gt_control"].shape


# ---------------------------------------------------------------------------
# test-time mirror ensembling
# ---------------------------------------------------------------------------


def test_steer_token_perm_is_involution_and_fixes_specials():
    perm = STEER_TOKEN_PERM
    np.testing.assert_array_equal(perm[perm], np.arange(tok.TOKEN_NUMS))
    # specials and the full-lock / neutral steer tokens
    for t in (tok.BOS, tok.EOS, tok.PAD):
        assert perm[t] == t
    assert perm[0] == tok.VALID_TOKEN  # steer -1 <-> steer +1
    assert perm[tok.VALID_TOKEN // 2] == tok.VALID_TOKEN // 2  # steer 0


def _ensembled_model(decoder_type):
    model_cfg = dataclasses.replace(TINY_MODEL, decoder_type=decoder_type)
    model = ParkingModel(model_cfg, TINY_SIM)
    batch = _tiny_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        batch["images"], batch["ego_motion"], batch["target_point"],
        batch["gt_control"], train=False)
    return model, variables, batch


@pytest.mark.parametrize("decoder_type", ["transformer", "mlp"])
def test_predict_ensemble_is_exactly_chirality_balanced(decoder_type):
    """predict_ensemble(mirror(obs)) == mirror(predict_ensemble(obs)).

    Exact by construction: the mirrored call's (a, b) streams are the
    original call's (b, a) streams (mirror_observation is a bitwise
    involution), log-prob addition is commutative, and the steer-token
    permutation is an involution — so the generated chains must be each
    other's mirror_sequence, and the averaged seg maps each other's
    column flip. Checked on random weights, where any bookkeeping slip
    (wrong perm axis, wrong steer positions, wrong seg flip) breaks it.
    """
    model, variables, batch = _ensembled_model(decoder_type)
    img = batch["images"][:2]
    ego = batch["ego_motion"][:2]
    tp = batch["target_point"][:2]

    fn = jax.jit(lambda v, i, e, t: model.apply(
        v, i, e, t, method=model.predict_ensemble))
    toks, seg, _, _ = fn(variables, img, ego, tp)
    m_img, m_ego, m_tp = mirror_observation(img, ego, tp)
    toks_m, seg_m, _, _ = fn(variables, m_img, m_ego, m_tp)

    np.testing.assert_array_equal(
        np.asarray(toks_m), np.asarray(mirror_sequence(toks)))
    np.testing.assert_allclose(
        np.asarray(seg_m, np.float32), np.asarray(seg[:, :, ::-1], np.float32),
        atol=1e-6)
    # tokens are well-formed: BOS prefix preserved, vocab-bounded
    assert int(toks[0, 0]) == TINY_MODEL.bos_token
    assert np.asarray(toks).max() < TINY_MODEL.token_nums


def test_predict_ensemble_vs_plain_shapes():
    """Ensemble output contract matches plain predict (drop-in for eval)."""
    model, variables, batch = _ensembled_model("transformer")
    img, ego, tp = (batch["images"][:2], batch["ego_motion"][:2],
                    batch["target_point"][:2])
    t0, s0, d0, st0 = model.apply(variables, img, ego, tp, method=model.predict)
    t1, s1, d1, st1 = model.apply(variables, img, ego, tp,
                                  method=model.predict_ensemble)
    assert t1.shape == t0.shape and s1.shape == s0.shape
    assert d1.shape == d0.shape and st1.shape == st0.shape
