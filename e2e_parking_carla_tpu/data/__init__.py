"""Data pipelines: on-device expert rollouts (the primary source) and an
interop reader for the reference's on-disk episode format."""

from e2e_parking_carla_tpu.data.rollout import (  # noqa: F401
    EpisodeBuffer,
    collect_episodes,
    make_batch,
)
