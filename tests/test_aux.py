"""Auxiliary subsystems: checkpoint/resume, stats, image IO, config."""

import numpy as np
import pytest

from ptdn_tpu.engine import Renderer
from ptdn_tpu.scene import Scene
from ptdn_tpu.utils.checkpoint import load_state, restore_renderer, save_state
from ptdn_tpu.utils.config import RenderConfig
from ptdn_tpu.utils.stats import StatsCollector

from ptdn_tpu.utils.assets import scenes_dir

scene_path_str = str(scenes_dir())

RES = (64, 64)


@pytest.fixture(scope="module")
def cornell():
    return Scene(scene_path_str + "/cornell.txt")


def test_checkpoint_resume_bitexact(cornell, tmp_path):
    """Resuming from a checkpoint must continue the exact accumulation."""
    cfg = RenderConfig(denoise_enable=False, trace_depth=3)
    r1 = Renderer(cornell, cfg, resolution=RES)
    r1.render(3)
    ckpt = str(tmp_path / "state")
    save_state(ckpt, r1.state, r1.frame, r1.camera)
    a, _ = r1.render(2)

    r2 = Renderer(cornell, cfg, resolution=RES)
    restore_renderer(r2, ckpt)
    assert r2.frame == 3
    b, _ = r2.render(2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_types(cornell, tmp_path):
    cfg = RenderConfig(denoise_enable=True, temporal_enable=True,
                       spatial_enable=True, trace_depth=2)
    r = Renderer(cornell, cfg, resolution=RES)
    r.render(2)
    p = save_state(str(tmp_path / "st"), r.state, r.frame, r.camera)
    state, frame, cam = load_state(p)
    assert frame == 2 and cam is not None
    assert set(state.keys()) == set(r.state.keys())
    for k in state:
        assert state[k].shape == r.state[k].shape


def test_stats_collector(cornell):
    cfg = RenderConfig(denoise_enable=True, temporal_enable=True,
                       spatial_enable=True, trace_depth=2)
    sc = StatsCollector(Renderer(cornell, cfg, resolution=RES),
                        collect_denoiser_stats=True)
    sc.render_frame()
    sc.render_frame()
    st = sc.frames[-1]
    assert st.ms > 0 and st.rays_per_s > 0
    assert 0.0 <= st.history_rejection_rate <= 1.0
    assert st.mean_variance >= 0
    assert "rays_per_s" in st.json()


def test_save_image_like_reference(tmp_path):
    from ptdn_tpu.utils import image_io

    img = np.zeros((4, 6, 3), np.float32)
    img[:, 0] = [1, 0, 0]  # leftmost column red
    path = image_io.save_image_like_reference(
        img, "testimg", 7, out_dir=str(tmp_path))
    assert "testimg." in path and path.endswith("samp.png")
    back = image_io.load_image_rgb(path)
    # horizontal flip (main.cpp:140): red ends up rightmost
    assert (back[:, -1] == [255, 0, 0]).all()


def test_hdr_writer_roundtrip(tmp_path):
    from ptdn_tpu.utils.image_io import save_hdr

    img = np.random.default_rng(0).uniform(0, 4, (8, 8, 3)).astype(np.float32)
    p = save_hdr(str(tmp_path / "x"), img)
    data = open(p, "rb").read()
    assert data.startswith(b"#?RADIANCE")
    assert b"-Y 8 +X 8" in data


def test_config_static_vs_traced():
    a = RenderConfig()
    b = a.replace(sigma_l=0.9)          # traced param: same static key
    assert a.static_key() == b.static_key()
    c = a.replace(trace_depth=6)        # structural: different key
    assert a.static_key() != c.static_key()
    tp = a.traced_params()
    assert set(tp) == {"shadow_intensity", "light_radius", "color_alpha",
                       "moment_alpha", "sigma_l", "sigma_x", "sigma_n"}


def test_cli_config_mapping():
    """Every reference ui_* control is reachable from the CLI."""
    from ptdn_tpu.app.cli import build_arg_parser, config_from_args

    args = build_arg_parser().parse_args([
        "scene.txt", "--depth", "7", "--denoise", "--temporal", "--spatial",
        "--sigma-l", "0.5", "--atrous-levels", "4", "--history-level", "2",
        "--sepcolor", "--addcolor", "--no-reducevar", "--sintensity", "3.5",
        "--lightradius", "2.0", "--view", "variance", "--automate",
        "--cam-speed", "0.1", "0", "0", "0.02", "0.03",
    ])
    cfg = config_from_args(args)
    assert cfg.trace_depth == 7 and cfg.denoise_enable
    assert cfg.temporal_enable and cfg.spatial_enable
    assert cfg.sigma_l == pytest.approx(0.5)
    assert cfg.atrous_nlevel == 4 and cfg.history_level == 2
    assert cfg.sep_color and cfg.add_color and not cfg.reduce_var
    assert cfg.shadow_intensity == pytest.approx(3.5)
    assert cfg.light_radius == pytest.approx(2.0)
    assert cfg.right_view_option == 2
    assert cfg.automate_camera and cfg.camera_speed_theta == pytest.approx(0.02)


def test_show_texture_flag(cornell):
    """SHOW_TEXTURE=0 equivalent: textured materials fall back to RGB."""
    import jax.numpy as jnp

    from ptdn_tpu.engine.wavefront import albedo_from, make_mat_reader

    ds = cornell.device()
    cfg = RenderConfig()
    read = make_mat_reader(cfg)
    from ptdn_tpu.engine.wavefront import sample_texture

    mat = jnp.full(4, 8, jnp.int32)  # textured wall material
    uv = jnp.full((4, 2), 0.5, jnp.float32)
    mv = read(ds, mat)
    with_tex = np.asarray(albedo_from(ds, mv, uv, True))
    without = np.asarray(albedo_from(ds, mv, uv, False))
    np.testing.assert_allclose(
        without, np.broadcast_to(np.asarray(ds.mat_color[8]), (4, 3)),
        atol=1e-6)
    expect = np.asarray(sample_texture(ds, jnp.zeros(4, jnp.int32), uv))
    np.testing.assert_allclose(with_tex, expect, atol=1e-6)
