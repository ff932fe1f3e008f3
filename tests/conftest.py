"""Test harness config.

Forces the CPU backend with 8 virtual devices BEFORE jax initializes, so
multi-device sharding tests (dp/tp over a `jax.sharding.Mesh`) run anywhere —
the strategy the reference never needed (it is single-GPU) but the rebuild's
parallel layer requires (SURVEY.md §4 test plan).
"""

import os

# NOTE: in this environment a sitecustomize pre-imports jax with
# JAX_PLATFORMS=axon (the tunneled TPU), so env vars set here are too late —
# jax.config.update below is what actually forces the CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
