"""Test config: force an 8-device virtual CPU mesh before jax initializes.

This substitutes for the reference's (nonexistent) fake cluster — multi-device
sharding paths are exercised on host CPU devices (SURVEY.md §4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # env presets axon (TPU); tests run CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Plugins (jaxtyping) may have imported jax before this conftest ran, in which
# case jax.config already latched JAX_PLATFORMS=axon from the environment.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
