"""Regenerate the golden npz files from the CPU XLA oracle.

Run from the repo root (CPU — goldens are oracle outputs, never TPU):

    JAX_PLATFORMS=cpu python tests/golden/generate.py [name ...]

Only regenerate a golden when an intentional math change invalidates it;
the diff must be reviewed against the reference semantics it encodes
(reference src/pathtrace.cu, src/denoise.cu)."""

import os
import sys

import jax

# pin host CPU exactly like tests/conftest.py — the axon TPU plugin
# registers itself as default regardless of JAX_PLATFORMS, and goldens
# MUST be CPU-oracle outputs (TPU float behavior differs in ULPs)
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tests.test_golden import (CONFIGS, PALLAS_CONFIGS,  # noqa: E402
                               PALLAS_SCENES, SCENES, _render)

GOLDEN = os.path.dirname(os.path.abspath(__file__))


def main(names):
    for name in names or sorted(CONFIGS):
        left, right = _render("xla", CONFIGS[name], SCENES[name])
        path = os.path.join(GOLDEN, f"{name}.npz")
        np.savez_compressed(path, left=left, right=right)
        print(f"wrote {path}  left_mean={left.mean():.6f} "
              f"right_mean={right.mean():.6f}")
    # pallas self-goldens (interpret mode on CPU, default flags): the
    # 1e-6 regression lock for the fused kernels
    for name in names or sorted(PALLAS_CONFIGS):
        if name not in PALLAS_CONFIGS:
            continue
        left, right = _render("pallas", PALLAS_CONFIGS[name],
                              PALLAS_SCENES[name])
        path = os.path.join(GOLDEN, f"{name}.pallas.npz")
        np.savez_compressed(path, left=left, right=right)
        print(f"wrote {path}  left_mean={left.mean():.6f} "
              f"right_mean={right.mean():.6f}")


if __name__ == "__main__":
    main(sys.argv[1:])
