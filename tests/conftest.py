"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container pre-imports jax and registers the axon TPU backend via
sitecustomize, so plain env-var overrides are too late; we reconfigure the
already-imported jax before any backend initialization instead. Real-TPU
behavior is exercised by bench.py / the driver's graft entry; unit tests stay
hermetic on CPU.
"""

import os
import sys

import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
