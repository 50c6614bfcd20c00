"""Test harness: force CPU with a virtual 8-device mesh so multi-chip
sharding logic is testable without TPU hardware (SURVEY.md §4).

NB: some installed pytest plugin imports jax before this conftest runs, so
plain env vars are too late — but XLA backends initialize *lazily*, so
``jax.config`` + XLA_FLAGS set here (before first device use) still apply.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices for sharding tests"
