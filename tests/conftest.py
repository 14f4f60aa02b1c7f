"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test session,
so sharding/pjit tests can exercise multi-chip paths without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The TPU-tunnel plugin (sitecustomize) can override JAX_PLATFORMS; force CPU
# explicitly so tests always run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs skip recompiling the
# (identical) model/train-step graphs, cutting wall time several-fold.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_rotations(rng, n):
    """Uniformly random rotation matrices via QR of Gaussian matrices."""
    A = rng.standard_normal((n, 3, 3))
    Q, R = np.linalg.qr(A)
    # fix signs so Q is a proper rotation
    sign = np.sign(np.einsum("nii->ni", R))
    Q = Q * sign[:, None, :]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return Q
