"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
tests are hermetic and sharding tests exercise real multi-device
compilation without TPUs.

The environment's sitecustomize registers the tunneled TPU platform and
pins it via jax config, so the env-var route (JAX_PLATFORMS) is not
enough — override through the config API before any backend use."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
