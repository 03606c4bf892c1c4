"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (standard JAX mesh-simulation trick, SURVEY.md §4e).

Environment quirk: this sandbox pre-imports jax at interpreter startup via
an axon sitecustomize with JAX_PLATFORMS=axon captured — setting env vars
here is too late for the platform choice, so we use jax.config.update
(valid until the first backend initialization). XLA_FLAGS is still read at
CPU-client creation, so setting it here works.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; got " + jax.devices()[0].platform)
    assert len(jax.devices()) == 8, (
        f"expected 8 virtual CPU devices, got {len(jax.devices())}")
