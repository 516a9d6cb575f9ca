"""On-device parking simulator (replaces the external CARLA server).

Pure-functional: `reset(key) -> state`, `step(state, control) -> state`,
all static shapes, vmappable over fleets of environments and jittable into
the same XLA program as the policy.
"""

from e2e_parking_carla_tpu.sim import scene  # noqa: F401
from e2e_parking_carla_tpu.sim.vehicle import VehicleControl, step_vehicle  # noqa: F401
from e2e_parking_carla_tpu.sim.env import (  # noqa: F401
    EgoState,
    EnvState,
    SceneState,
    Status,
    eval_metrics,
    reset_env,
    step_env,
)
