"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4)."""

import os
import sys

# force CPU even when the environment presets a TPU platform (JAX_PLATFORMS=axon)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("SWT_NO_COMPILE_CACHE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
