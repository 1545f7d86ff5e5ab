"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers the axon TPU plugin
before any test code runs, so env vars alone are too late — force the
platform through jax.config (SURVEY.md §4 item (d)).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
    assert jax.device_count() >= 8, "expected >= 8 virtual CPU devices"
