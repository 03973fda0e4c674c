"""Test configuration: force CPU with 8 virtual devices so mesh/sharding
tests run without TPU hardware (the analog of the reference's generated
thread-matrix tests, SURVEY.md §4.8).

Note: this environment's sitecustomize force-registers the TPU backend and
overrides jax_platforms, so setting the env var alone is not enough — we
update the config after import, before any backend is initialized by tests.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
