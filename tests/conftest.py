"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware.

Note: this environment's sitecustomize imports jax and registers the axon TPU
backend before pytest starts, so setting JAX_PLATFORMS via os.environ here is
too late — we must go through jax.config. The host-device count flag is also
read at backend init (which is lazy), so setting XLA_FLAGS here still works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare fp32 activations against PyTorch; keep fp32 matmuls
# exact rather than allowing bf16-passes reductions.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
