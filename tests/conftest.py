"""Test configuration: force a virtual 8-device CPU platform for JAX.

Tests validate numerics and multi-chip sharding without TPU hardware;
the env vars must be set before jax is first imported anywhere.
"""

import os

# JAX_PLATFORM_NAME (not JAX_PLATFORMS) is what the axon TPU plugin
# honors in this environment.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    # optimization_level=0: XLA:CPU takes minutes to optimize the long
    # integer-lifting chains at the default level; tests don't need it.
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
        " --xla_backend_optimization_level=0"
    ).strip()
