"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard fake-backend setup for testing TPU sharding logic
without a pod (SURVEY.md §4): JAX_PLATFORMS=cpu plus
--xla_force_host_platform_device_count=8. Must be set before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCENES = pathlib.Path("/root/reference/scenes")


@pytest.fixture(scope="session")
def scenes_dir():
    return SCENES


@pytest.fixture(scope="session")
def cornell_scene():
    from ptdn_tpu.scene import Scene

    return Scene(str(SCENES / "cornell.txt"))
