"""e2e_parking_carla_tpu — a TPU-native end-to-end autonomous parking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
qintonguav/e2e-parking-carla (IV 2024, "E2E Parking: Autonomous Parking by the
End-to-end Neural Network on the CARLA Simulator"):

* an on-device, pure-functional parking simulator (kinematic bicycle + OBB
  collision + surround-camera rasterizer) replacing the external CARLA server,
* an LSS-style BEV policy (camera encoder -> lift-splat -> BEV encoder ->
  transformer fusion -> autoregressive control-token decoder),
* imitation training (control CE + BEV seg CE + depth BCE) with optax/orbax,
* closed-loop evaluation (TSR/TFR/NTSR/NTFR/CR/OR/TR/APE/AOE/APT/AIT) vmapped
  over fleets of environments,
* SPMD scaling via jax.sharding Mesh + jit (data parallel by default, with
  model-axis sharding rules available).

Everything that runs per-step is jit-compatible: static shapes, lax control
flow, channels-last layouts, bf16 matmuls on the MXU.
"""

__version__ = "0.1.0"

from e2e_parking_carla_tpu.config import (  # noqa: F401
    Config,
    EvalConfig,
    ModelConfig,
    SimConfig,
    TrainConfig,
    config_from_dict,
    load_config,
)
