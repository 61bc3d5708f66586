"""Test harness: fake an 8-device TPU-like mesh on CPU.

The reference has no test suite at all (SURVEY.md section 4); its multi-GPU
paths were only exercised on real clusters. JAX lets us do better:
``--xla_force_host_platform_device_count=8`` gives every test an 8-device
mesh, so every sharding method (zero_1/2/3, fsdp variants, hybrid) runs as a
real SPMD program on CPU.

Must run before jax initializes its backends: xdist/site hooks may have
imported jax already, so we also force the platform via jax.config.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest failed to create 8 CPU devices"
    return devs
