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
# Keep the axon TPU plugin OUT of test processes entirely: merely
# initializing it (even with computations pinned to CPU) opens a tunnel
# client that contends with any real TPU job — measured round 4: a
# concurrent pytest run wedged the chip for ~40 min and polluted
# profile numbers 2-5x. Must be set before jax imports.
if os.environ.get("PTDN_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"

import pathlib

import jax
import pytest

# Belt and braces (e.g. PTDN_TEST_TPU runs): pin default computations
# to host CPU for determinism; sharding tests grab the 8 virtual CPU
# devices explicitly.
if os.environ.get("PTDN_TEST_TPU", "0") != "1":
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except RuntimeError:
        pass
jax.config.update("jax_default_matmul_precision", "highest")

REPO = pathlib.Path(__file__).resolve().parent.parent
# vendored fixtures (scenes/PROVENANCE.md) keep the suite self-contained;
# PTDN_SCENES_DIR points it at another copy (e.g. the upstream originals)
SCENES = pathlib.Path(os.environ.get("PTDN_SCENES_DIR", REPO / "scenes"))


@pytest.fixture(scope="session")
def scenes_dir():
    return SCENES


@pytest.fixture(scope="session")
def cornell_scene():
    from ptdn_tpu.scene import Scene

    return Scene(str(SCENES / "cornell.txt"))
