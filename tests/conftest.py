"""Test env: run JAX on 8 virtual CPU devices so sharding/collective tests
work without TPU hardware (the reference has no analogue of this —
multi-GPU was only testable by launching real processes, SURVEY.md §4).

Note: the env var JAX_PLATFORMS alone is NOT enough here — the machine's
'axon' TPU plugin overrides it, and every compile would cross the TPU
tunnel. jax.config.update is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat suite runs skip CPU recompiles
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly marked slow is the fast/core tier, so
    ``-m fast`` and ``-m "not slow"`` select the same < 5-min subset."""
    import pytest

    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)
