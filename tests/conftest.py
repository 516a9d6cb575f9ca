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

# Persistent compilation cache: the first full run pays CPU-XLA compile time
# (minutes for the train/eval programs); later runs hit the cache.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Build the native episode codec so its parity tests run (it otherwise
# self-skips and the C++ path is never exercised). Graceful fallback: a
# missing toolchain only re-enables the skip, it never fails collection.
_native_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
if not os.path.exists(os.path.join(_native_dir, "libepisode_codec.so")):
    import subprocess

    try:
        subprocess.run(["make", "-C", _native_dir], check=True,
                       capture_output=True, timeout=120)
    except Exception as e:  # noqa: BLE001 — any build failure just skips
        print(f"conftest: native codec build skipped ({e})")
