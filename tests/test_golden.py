"""Golden-image regression: both backends must reproduce the committed
reference renders (SURVEY.md §4's 'golden-image regression per scene
config'). Goldens were generated on the CPU XLA oracle; the pallas
backend is allowed float-level noise plus a tiny budget of tie-flip
pixels at geometry boundaries."""

import os

import numpy as np
import pytest

from ptdn_tpu.engine import Renderer
from ptdn_tpu.scene import Scene
from ptdn_tpu.utils.config import RenderConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

CONFIGS = {
    "cornell_raw_d3": dict(denoise_enable=False, trace_depth=3),
    "cornell_svgf_d3": dict(denoise_enable=True, temporal_enable=True,
                            spatial_enable=True, trace_depth=3,
                            atrous_nlevel=3),
}


def _render(backend, cfgkw):
    s = Scene("/root/reference/scenes/cornell.txt")
    r = Renderer(s, RenderConfig(backend=backend, **cfgkw),
                 resolution=(64, 64))
    left = right = None
    for _ in range(3):
        left, right = r.render_frame()
    return np.asarray(left), np.asarray(right)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_xla(name):
    g = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    left, right = _render("xla", CONFIGS[name])
    np.testing.assert_allclose(left, g["left"], atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(right, g["right"], atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("name", sorted(CONFIGS))
@pytest.mark.parametrize("fused", [False, True])
def test_golden_pallas(name, fused):
    g = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    left, right = _render("pallas", dict(CONFIGS[name], fuse_bounce=fused))
    # boundary tie-flip pixels; the à-trous filter spreads each into its
    # dilated 5x5 neighborhood, so the SVGF config gets a larger budget
    frac_budget = 0.08 if "svgf" in name else 0.01
    for img, ref in [(left, g["left"]), (right, g["right"])]:
        diff = np.abs(img - ref).max(axis=-1)
        assert (diff > 1e-3).mean() < frac_budget
        assert np.sqrt(((img - ref) ** 2).mean()) < 0.02
