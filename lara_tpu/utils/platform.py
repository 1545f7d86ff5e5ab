"""Platform selection helper.

The container's sitecustomize imports jax and registers the TPU plugin
before user code runs, so JAX_PLATFORMS set in the environment of a child
process is overridden. Entry points call `apply_platform_env()` to honor
LARA_PLATFORM=cpu|tpu (and LARA_CPU_DEVICES=N for a virtual CPU mesh)."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("LARA_PLATFORM")
    cache = os.environ.get("LARA_COMPILE_CACHE", "/tmp/lara_jax_cache")
    if cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n_cpu = os.environ.get("LARA_CPU_DEVICES")
    if n_cpu and "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_cpu}"
        ).strip()
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
