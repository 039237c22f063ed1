"""Test env: CPU backend with 8 virtual devices (multi-chip sharding tests
without a pod — SURVEY.md §4), float64 enabled for oracle-exactness checks.

Note: this machine pre-sets JAX_PLATFORMS=axon (TPU tunnel); env vars alone do
not override it, so we force the platform via jax.config before any backend
initialization.  Tests must therefore import jax only after this conftest runs
(pytest guarantees that for files under tests/).
"""
import os

if os.environ.get("GBP_ON_TPU") == "1":
    # On-chip lane: leave the platform alone (axon/TPU) and stay f32 — this
    # is how `pytest tests/tpu -q` exercises the real device (tests/tpu/
    # skips itself when the backend is CPU).
    pass
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
