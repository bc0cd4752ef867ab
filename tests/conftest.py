"""Test configuration: force an 8-device virtual CPU mesh.

TPU hardware in CI may be a single chip (or absent); sharding tests run on
XLA's host-platform device simulation, per SURVEY.md §4.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (e.g. a tunneled TPU): unit
# tests must be fast and deterministic; the bench exercises real hardware.
# NOTE: a sitecustomize may import jax before this file runs, so setting the
# env var alone is not enough — update the live jax config too.
os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compilation cache under tests: CPU AOT executables cached by
# other processes may carry mismatched machine-feature sets (SIGILL risk),
# and tests must not depend on cache state.
os.environ["AIP_TPU_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
