"""Optimizer + train/val steps.

Mirrors the reference's training recipe (trainer/pl_trainer.py:116-121):
Adam with coupled L2 weight decay (torch semantics: decay added to the
gradient before the Adam moments) and a cosine learning-rate schedule over
epochs; the step loss is the sum of control CE + seg CE + depth BCE
(pl_trainer.py:55-83); validation logs the detokenized acc/steer/reverse
losses (pl_trainer.py:85-114).

Steps are built per-mesh: batch sharded over "data", params sharded by the
rules in parallel/mesh.py; XLA inserts the gradient all-reduce (the
reference needed a DDP process group for the same thing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import struct

from e2e_parking_carla_tpu import losses
from e2e_parking_carla_tpu.config import Config


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    # Exponential moving average of params. Closed-loop quality is very
    # sensitive to the exact SGD iterate (adjacent checkpoints swing 0<->67
    # TSR while open-loop val barely moves — STATUS round 1); the EMA is the
    # deploy/eval weight set. decay=0 disables (ema == params).
    ema_params: dict = None


def make_optimizer(cfg: Config, steps_per_epoch: int = 1000):
    """Adam + coupled weight decay + cosine(T_max=epochs) schedule."""
    schedule = optax.cosine_decay_schedule(
        init_value=cfg.train.learning_rate,
        decay_steps=max(cfg.train.epochs * steps_per_epoch, 1),
        alpha=getattr(cfg.train, "lr_min_frac", 0.0),
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.train.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def create_train_state(model, cfg: Config, rng, sample_batch,
                       steps_per_epoch: int = 1000) -> TrainState:
    # jit the init: op-by-op dispatch is pathological on remote backends
    init = jax.jit(lambda rngs, i, m, t, g: model.init(rngs, i, m, t, g, train=False))
    variables = init(
        {"params": rng, "dropout": jax.random.PRNGKey(0)},
        sample_batch["images"], sample_batch["ego_motion"],
        sample_batch["target_point"], sample_batch["gt_control"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.int32(0),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=params,
    )


def build_train_step(model, cfg: Config, steps_per_epoch: int = 1000):
    """Un-jitted (state, batch, rng) -> (state, metrics) — for embedding in
    larger jitted programs (e.g. the fused multi-step chunk in loop.py)."""
    tx = make_optimizer(cfg, steps_per_epoch)
    model_cfg = cfg.model

    def train_step(state: TrainState, batch, rng):
        drop_rng, noise_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], batch["ego_motion"], batch["target_point"],
                batch["gt_control"], train=True,
                rngs={"dropout": drop_rng, "target_noise": noise_rng},
                mutable=["batch_stats"])
            logits, seg, depth = out
            loss_dict = losses.total_training_loss(logits, seg, depth, batch, model_cfg)
            return loss_dict["train_loss"], (loss_dict, updates["batch_stats"])

        (_, (loss_dict, new_bstats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = cfg.train.ema_decay
        if d > 0.0:
            # bias-corrected EMA: warm up the effective decay so early steps
            # aren't anchored to the random init
            eff = jnp.minimum(d, (1.0 + state.step) / (10.0 + state.step))
            new_ema = jax.tree.map(
                lambda e, p: e * eff + p.astype(e.dtype) * (1.0 - eff),
                state.ema_params, new_params)
        else:
            new_ema = new_params
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bstats, opt_state=new_opt,
                               ema_params=new_ema)
        return new_state, loss_dict

    return train_step


def make_train_step(model, cfg: Config, steps_per_epoch: int = 1000,
                    donate: bool = True):
    """Jitted (state, batch, rng) -> (state, metrics).

    Under a mesh, placement comes from the inputs: put the TrainState with
    parallel.shard_params / replication and the batch with
    parallel.shard_batch — jit propagates those shardings and XLA inserts
    the gradient all-reduce over the "data" axis.
    """
    train_step = build_train_step(model, cfg, steps_per_epoch)
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_val_step(model, cfg: Config):
    """Returns jitted (state, batch) -> val-loss dict (reference
    validation_step, pl_trainer.py:85-114)."""
    model_cfg = cfg.model

    def val_step(state: TrainState, batch):
        logits, seg, depth = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], batch["ego_motion"], batch["target_point"],
            batch["gt_control"], train=False)
        acc_steer, rev = losses.control_val_losses(
            logits, batch["gt_acc"], batch["gt_steer"], batch["gt_reverse"], model_cfg)
        seg_l = losses.segmentation_loss(seg, batch["segmentation"],
                                         model_cfg.seg_vehicle_weights)
        depth_l = losses.depth_loss(depth, batch["depth"], model_cfg)
        val = acc_steer + rev + seg_l + depth_l
        return {
            "acc_steer_val_loss": acc_steer,
            "reverse_val_loss": rev,
            "segmentation_val_loss": seg_l,
            "depth_val_loss": depth_l,
            "val_loss": val,
        }

    return jax.jit(val_step)
