"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the JAX analog of the
reference's single-binary gtest setup, SURVEY.md §4).

Note: this environment pre-registers a TPU ('axon') PJRT backend via
sitecustomize and sets JAX_PLATFORMS=axon, so we must force the CPU platform
through jax.config (env vars are already consumed by the time tests import).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
