"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host CPU devices
(xla_force_host_platform_device_count) exactly as the driver's
dryrun_multichip does; real-TPU execution is covered by bench.py.
"""

import os

# Force CPU: the session env presets JAX_PLATFORMS=axon (one real TPU via a
# tunnel); tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon plugin overrides JAX_PLATFORMS at import time ("axon,cpu"); the
# config update below is the only way to actually pin tests to the CPU mesh.
jax.config.update("jax_platforms", "cpu")

# The environment's default conv/matmul precision is bf16 even on CPU;
# numerical-parity tests need true fp32 math.
jax.config.update("jax_default_matmul_precision", "float32")

# Single-core host: per-op XLA compiles dominate test time.  The persistent
# cache makes reruns ~free.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
