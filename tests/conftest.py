"""Test configuration: run JAX on a virtual 8-device CPU mesh so
sharding tests exercise real multi-device compilation without TPUs."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
