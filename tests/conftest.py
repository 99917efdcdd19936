"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard fake-backend setup for testing TPU sharding logic
without a pod (SURVEY.md §4): JAX_PLATFORMS=cpu plus
--xla_force_host_platform_device_count=8. Must be set before jax imports.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import jax
import pytest

# The axon TPU plugin registers itself as the default backend regardless of
# JAX_PLATFORMS; pin test computations to host CPU for determinism and so
# the suite runs without TPU access. Sharding tests grab the 8 virtual CPU
# devices explicitly.
if os.environ.get("PTDN_TEST_TPU", "0") != "1":
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass
jax.config.update("jax_default_matmul_precision", "highest")

REPO = pathlib.Path(__file__).resolve().parent.parent
SCENES = pathlib.Path("/root/reference/scenes")


@pytest.fixture(scope="session")
def scenes_dir():
    return SCENES


@pytest.fixture(scope="session")
def cornell_scene():
    from ptdn_tpu.scene import Scene

    return Scene(str(SCENES / "cornell.txt"))
