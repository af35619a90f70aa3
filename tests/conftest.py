"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (mirrors SURVEY.md §4 strategy).

Note: this image's sitecustomize force-registers the axon TPU platform and
prepends it to jax_platforms, so setting the env var alone is not enough —
we must override the config after importing jax (before any backend use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
