"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4).

Note: this environment's ``sitecustomize`` imports jax and registers the
``axon`` TPU backend before any user code runs, so setting ``JAX_PLATFORMS``
here is too late — override through ``jax.config`` instead (backends are not
initialized until first use, so this still wins)."""

import os
import sys

os.environ.setdefault("SWT_NO_COMPILE_CACHE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
