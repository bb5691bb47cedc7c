"""Test env: run JAX on 8 virtual CPU devices so sharding/collective tests
work without TPU hardware (the reference has no analogue of this —
multi-GPU was only testable by launching real processes, SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
