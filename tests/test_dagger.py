"""DAgger collection tests: expert-labeled policy rollouts (data/dagger.py).

The key contract: whatever mixture actually drives, the recorded control
fields are the EXPERT's recommendations at the visited states, and the
buffer slots straight into make_batch / concat with the BC buffer.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from e2e_parking_carla_tpu.config import EvalConfig
from e2e_parking_carla_tpu.data.dagger import collect_dagger_episodes, concat_buffers
from e2e_parking_carla_tpu.data.rollout import collect_episodes, make_batch
from e2e_parking_carla_tpu.models import ParkingModel

from tests.test_pipeline import TINY_MODEL, TINY_SIM

EVAL = EvalConfig()


def _predict_fn(model):
    def predict(variables, images, ego_motion, target_point):
        return model.apply(variables, images, ego_motion, target_point,
                           method=model.predict)
    return predict


def _init_model():
    model = ParkingModel(TINY_MODEL, TINY_SIM)
    H = TINY_MODEL.image_crop
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, H, H, 3)),
        jnp.zeros((1, 1, 3)), jnp.zeros((1, 2)),
        jnp.zeros((1, 14), jnp.int32), train=False))()
    return model, variables


def test_dagger_buffer_feeds_training():
    model, variables = _init_model()
    buf = jax.jit(lambda v, k: collect_dagger_episodes(
        _predict_fn(model), v, k, 2, TINY_MODEL, TINY_SIM, EVAL,
        expert_mix=0.5, max_frames=300))(variables, jax.random.PRNGKey(1))
    assert buf.ego_x.shape == (2, 100)  # policy_every=3 -> 100 decisions
    assert np.asarray(buf.valid).dtype == np.bool_
    # unlike BC collection, validity must not require success
    assert np.asarray(buf.valid).sum() > 0

    bc = jax.jit(lambda k: collect_episodes(
        k, 2, TINY_MODEL, TINY_SIM, EVAL, max_frames=300))(jax.random.PRNGKey(2))
    both = concat_buffers(bc, buf)
    assert both.ego_x.shape[0] == 4
    batch = jax.jit(lambda b, k: make_batch(b, k, 4, TINY_MODEL, TINY_SIM))(
        both, jax.random.PRNGKey(3))
    assert batch["images"].shape[0] == 4
    assert bool(jnp.isfinite(batch["images"]).all())


def test_dagger_pure_expert_mixture_ignores_policy():
    """With expert_mix=1.0 only the expert drives, so the visited trajectory
    (and the labels) must be identical for any policy weights."""
    model, variables = _init_model()
    perturbed = jax.tree.map(lambda p: p + 0.3, variables)
    key = jax.random.PRNGKey(4)
    fn = jax.jit(lambda v, k: collect_dagger_episodes(
        _predict_fn(model), v, k, 2, TINY_MODEL, TINY_SIM, EVAL,
        expert_mix=1.0, max_frames=300))
    a = fn(variables, key)
    b = fn(perturbed, key)
    np.testing.assert_array_equal(np.asarray(a.ego_x), np.asarray(b.ego_x))
    np.testing.assert_array_equal(np.asarray(a.steer), np.asarray(b.steer))
    np.testing.assert_array_equal(np.asarray(a.reverse), np.asarray(b.reverse))


def test_dagger_timeout_stride_supersets_drop():
    """timeout_keep_every must only ADD frames of timeout/outbound episodes
    back (on the stride), relative to dropping those episodes entirely, and
    every added frame must lie on the stride."""
    model, variables = _init_model()
    key = jax.random.PRNGKey(5)

    def collect(keep):
        return jax.jit(lambda v, k: collect_dagger_episodes(
            _predict_fn(model), v, k, 4, TINY_MODEL, TINY_SIM, EVAL,
            expert_mix=0.0, max_frames=300,  # pure policy: plenty of timeouts
            timeout_keep_every=keep))(variables, key)

    dropped = np.asarray(collect(0).valid)
    strided = np.asarray(collect(4).valid)
    # same trajectory (same key, labels unaffected); drop-valid is a subset
    assert (dropped & ~strided).sum() == 0
    added = strided & ~dropped
    t = np.arange(dropped.shape[1])[None, :]
    assert (added & (t % 4 != 0)).sum() == 0
