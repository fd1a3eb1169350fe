"""Test configuration: run the suite on the CPU backend with 8 virtual
devices so sharding logic is exercised without a TPU pod, and so results are
deterministic.  Mirrors the reference's strategy of value-pinned CPU tests
(reference ``tests/``, SURVEY.md §4).

The dev image's sitecustomize registers the ``axon`` (tunneled TPU) backend
and calls ``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter
startup — env vars alone cannot win, so we override the config after import.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is compile-dominated (depth-30
# featuremap programs), so repeat runs drop from ~12 min to ~3 min.  Kept
# separate from the TPU cache (.jax_cache).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
