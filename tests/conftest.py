"""Test configuration: 8-device virtual CPU mesh + float64.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
compile and execute without TPU hardware; numerical ground-truth tests use
float64 (the TPU path runs float32 and is exercised by bench.py).

Note: the environment's axon sitecustomize force-registers the TPU backend
and sets jax_platforms programmatically, so we must override via
jax.config (env vars alone are ignored).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
