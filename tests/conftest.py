"""Test env: force JAX onto CPU with 8 virtual devices BEFORE jax imports.

Multi-chip sharding tests run on this virtual mesh (the driver separately
dry-runs the multi-chip path); real-TPU benchmarks live behind the `tpu`
marker and are not part of the default suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# a sitecustomize.py may force the TPU plugin via jax_platforms; override it
# before any backend is initialized so the suite runs on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def tmp_nifti(tmp_path, rng):
    """A small synthetic CT volume on disk with a non-trivial affine."""
    from boa_tpu.io import nifti

    data = rng.integers(-1000, 1500, size=(31, 27, 23)).astype(np.int16)
    affine = np.array(
        [
            [-0.9, 0.0, 0.0, 120.0],
            [0.0, -0.8, 0.0, 95.0],
            [0.0, 0.0, 1.5, -300.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    img = nifti.NiftiImage(data=data, affine=affine)
    p = tmp_path / "ct.nii.gz"
    nifti.save(img, p)
    return p
