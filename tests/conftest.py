"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
tests run without a TPU pod (the standard fake-multi-device setup,
SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Skip axon TPU plugin registration entirely (sitecustomize registers it
# iff PALLAS_AXON_POOL_IPS is set): tests are CPU-only, and every test
# process otherwise opens a connection through the single-tenant TPU
# tunnel — dozens of concurrent connections can wedge the remote worker
# for real TPU jobs running alongside.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
# HARD set (not setdefault): the interactive axon session exports
# JAX_PLATFORMS=axon, and a test process must never ride the single-tenant
# TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The env vars above are NOT enough when sitecustomize already imported
# jax (the axon boot path does, latching jax_platforms='axon' from the
# interactive env before this file runs): jax.devices() then still
# returns the real TPU, and any test building a Mesh / using an explicit
# device rides the single-tenant tunnel — observed as a 1-ulp
# TPU-matmul-precision flake in the serve parity tests.  Forcing the
# CONFIG (not just the env) restricts backend selection to CPU even in
# an interpreter where the plugin was registered at startup.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_device", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def toy_image(rng):
    """Small smooth grayscale test image (32x32x1)."""
    y, x = np.mgrid[0:32, 0:32] / 31.0
    img = 0.5 + 0.25 * np.sin(4 * x) * np.cos(3 * y)
    return img[..., None].astype(np.float32)


@pytest.fixture(scope="session")
def toy_rgb(rng):
    y, x = np.mgrid[0:32, 0:32] / 31.0
    img = np.stack([
        0.5 + 0.3 * np.sin(5 * x),
        0.5 + 0.3 * np.cos(4 * y),
        0.4 + 0.2 * np.sin(3 * (x + y)),
    ], axis=-1)
    return img.astype(np.float32)
