"""Test configuration: force the CPU backend (float64 parity tests)
with a virtual 8-device mesh for the multi-chip sharding tests
(the analog of multi-node tests without a real cluster)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import matplotlib  # noqa: E402

matplotlib.use("agg")
