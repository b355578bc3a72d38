"""Test configuration: force an 8-virtual-device CPU mesh.

This is the idiomatic JAX "fake backend" (SURVEY.md §4): sharding and
collectives are exercised on 8 host devices without TPU hardware.  The env
var must be set before jax initializes; the platform override must go
through jax.config because the axon sitecustomize pins JAX_PLATFORMS.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import struct  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def write_idx_images(path, images: np.ndarray) -> None:
    """Write a MNIST images idx3 file (shared test fixture helper)."""
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 2051))
        f.write(struct.pack(">III", *images.shape))
        f.write(images.tobytes())


def write_idx_labels(path, labels: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 2049))
        f.write(struct.pack(">I", labels.shape[0]))
        f.write(labels.tobytes())
