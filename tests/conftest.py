"""Test env: CPU backend with 8 virtual devices (multi-chip sharding tests
without a pod — SURVEY.md §4), float64 enabled for oracle-exactness checks.

Note: this machine pre-sets JAX_PLATFORMS=axon (TPU tunnel); env vars alone do
not override it, so we force the platform via jax.config before any backend
initialization.  Tests must therefore import jax only after this conftest runs
(pytest guarantees that for files under tests/).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
