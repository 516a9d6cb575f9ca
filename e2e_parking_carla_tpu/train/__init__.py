"""Training: optimizer, train/val steps, checkpointing, in-loop data."""

from e2e_parking_carla_tpu.train.trainer import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_val_step,
)
