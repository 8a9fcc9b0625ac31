"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding is tested on a single host via XLA's host-platform
device-count override — the idiomatic JAX answer to "test distributed
without a cluster".  This must happen before the first JAX backend
initialization, hence at conftest import time.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The axon TPU plugin (if present) programmatically selects its platform at
# interpreter start; override back to CPU for hermetic, fast tests.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))
