"""Device-math unit tests: RNG bit-exactness, intersections vs closed form,
BVH traversal vs brute force, BSDF sampling invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ptdn_tpu.ops import bsdf, intersect, rng
from ptdn_tpu.ops.bvh_traverse import mesh_brute_force, mesh_bvh_batched
from ptdn_tpu.ops.camera import OrbitCamera, generate_camera_rays, view_matrix

from ptdn_tpu.utils.assets import scenes_dir

scene_path_str = str(scenes_dir())


# ---------------- RNG ----------------

def _ref_init_rand(v0, v1, backoff=16):
    """Pure-python reimplementation of interactions.h:10-22 for oracle."""
    M = 0xFFFFFFFF
    s0 = 0
    for _ in range(backoff):
        s0 = (s0 + 0x9E3779B9) & M
        v0 = (v0 + ((((v1 << 4) & M) + 0xA341316C) & M ^ ((v1 + s0) & M)
                    ^ (((v1 >> 5) + 0xC8013EA4) & M))) & M
        v1 = (v1 + ((((v0 << 4) & M) + 0xAD90777D) & M ^ ((v0 + s0) & M)
                    ^ (((v0 >> 5) + 0x7E95761E) & M))) & M
    return v0


def _ref_next_rand(s):
    s = (1664525 * s + 1013904223) & 0xFFFFFFFF
    return s, float(s & 0x00FFFFFF) / float(0x01000000)


def test_init_rand_bit_exact():
    vals0 = np.array([0, 1, 12345, 640000 - 1, 2**31], np.uint32)
    vals1 = np.array([0, 1, 7, 99, 3], np.uint32)
    got = np.asarray(rng.init_rand(jnp.asarray(vals0), jnp.asarray(vals1)))
    want = np.array([_ref_init_rand(int(a), int(b)) for a, b in zip(vals0, vals1)],
                    np.uint32)
    np.testing.assert_array_equal(got, want)


def test_next_rand_bit_exact_stream():
    seed = rng.init_rand(jnp.asarray([42], np.uint32), jnp.asarray([7], np.uint32))
    s_ref = _ref_init_rand(42, 7)
    for _ in range(10):
        seed, val = rng.next_rand(seed)
        s_ref, v_ref = _ref_next_rand(s_ref)
        assert int(seed[0]) == s_ref
        assert float(val[0]) == pytest.approx(v_ref, abs=0)


def test_next_rand_masked_stream_position():
    seed0 = jnp.asarray([100, 100], np.uint32)
    mask = jnp.asarray([True, False])
    s1, _ = rng.next_rand_masked(seed0, mask)
    assert int(s1[0]) != 100 and int(s1[1]) == 100


# ---------------- intersections ----------------

def _id4():
    return jnp.eye(4, dtype=jnp.float32)


def test_sphere_closed_form():
    o = jnp.asarray([[0, 0, 5.0], [0, 0, 5.0], [0, 0, 0.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1.0], [0, 1, 0.0], [0, 0, -1.0]], jnp.float32)
    t, p, n, outside, hit = intersect.sphere_intersect(_id4(), _id4(), _id4(), o, d)
    assert bool(hit[0]) and not bool(hit[1]) and bool(hit[2])
    assert float(t[0]) == pytest.approx(4.5, abs=1e-3)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-4)
    # ray from inside: normal flipped, outside False
    assert not bool(outside[2])
    np.testing.assert_allclose(np.asarray(n[2]), [0, 0, 1], atol=1e-3)


def test_box_closed_form():
    o = jnp.asarray([[0, 0, 5.0], [2, 0, 5.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1.0], [0, 0, -1.0]], jnp.float32)
    t, p, n, outside, hit = intersect.box_intersect(_id4(), _id4(), o, d)
    assert bool(hit[0]) and not bool(hit[1])
    assert float(t[0]) == pytest.approx(4.5, abs=1e-3)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-5)


def test_box_transformed():
    from ptdn_tpu.utils import math3d

    m = math3d.build_transformation_matrix([0, 2, 0], [0, 0, 0], [4, 4, 4])
    inv = np.linalg.inv(m.astype(np.float64)).astype(np.float32)
    o = jnp.asarray([[0, 2, 10.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1.0]], jnp.float32)
    t, p, n, outside, hit = intersect.box_intersect(
        jnp.asarray(m), jnp.asarray(inv), o, d)
    assert bool(hit[0])
    assert float(t[0]) == pytest.approx(8.0, abs=1e-3)


def test_triangle_backface_culling():
    v0 = jnp.asarray([[-1, -1, 0.0]], jnp.float32)
    v1 = jnp.asarray([[1, -1, 0.0]], jnp.float32)
    v2 = jnp.asarray([[0, 1, 0.0]], jnp.float32)
    o = jnp.asarray([[0, 0, 5.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1.0]], jnp.float32)
    # front face (counter-clockwise from +z): e1 x e2 points +z -> a > 0
    t, u, v, hit = intersect.ray_triangle(o, d, v0, v1, v2)
    assert bool(hit[0]) and float(t[0]) == pytest.approx(5.0, abs=1e-5)
    # from behind: culled (glm intersect.inl:53-54)
    t2, _, _, hit2 = intersect.ray_triangle(-o, -d, v0, v1, v2)
    assert not bool(hit2[0])


# ---------------- BVH traversal vs brute force ----------------

@pytest.mark.parametrize("scene_name", ["bunny.txt", "cornell.txt"])
def test_bvh_matches_brute_force(scenes_dir, scene_name):
    from ptdn_tpu.scene import Scene

    s = Scene(str(scenes_dir / scene_name))
    ds = s.device()
    rng_np = np.random.default_rng(0)
    n = 256
    # rays aimed at the mesh bounding boxes from random directions
    center = (s.mesh_bb_min[0] + s.mesh_bb_max[0]) / 2
    o = (center + rng_np.normal(size=(n, 3)) * 8).astype(np.float32)
    d = (center - o) + rng_np.normal(size=(n, 3)) * 0.5
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    tb, ub, vb, ib, hb = mesh_brute_force(ds, jnp.asarray(o), jnp.asarray(d),
                                          s.n_tris)
    max_prims = int(s.bvh.prim_count.max())
    tv, uv, vv, iv, hv = mesh_bvh_batched(ds, jnp.asarray(o), jnp.asarray(d),
                                          max_prims=max(max_prims, 1))
    np.testing.assert_array_equal(np.asarray(hb), np.asarray(hv))
    m = np.asarray(hb)
    np.testing.assert_allclose(np.asarray(tb)[m], np.asarray(tv)[m], rtol=1e-5)
    # same triangle except exact-tie cases
    same = np.asarray(ib)[m] == np.asarray(iv)[m]
    assert same.mean() > 0.99


# ---------------- BSDF ----------------

def test_cosine_hemisphere_distribution():
    n = jnp.broadcast_to(jnp.asarray([0.0, 0, 1]), (20000, 3))
    key_up = jnp.asarray(np.random.default_rng(1).uniform(size=20000), jnp.float32)
    key_ar = jnp.asarray(np.random.default_rng(2).uniform(size=20000), jnp.float32)
    d = np.asarray(bsdf.cosine_hemisphere(n, key_up, key_ar))
    assert (d[:, 2] > -1e-6).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    # cosine-weighted: E[cos] = 2/3
    assert abs(d[:, 2].mean() - 2 / 3) < 0.01


def test_reflect_refract():
    i = jnp.asarray([[0.70710678, 0.0, -0.70710678]], jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    r = np.asarray(bsdf.reflect(i, n))
    np.testing.assert_allclose(r, [[0.70710678, 0, 0.70710678]], atol=1e-6)
    # refraction into denser medium bends toward normal
    t = np.asarray(bsdf.refract(i, n, jnp.asarray([1 / 1.5], jnp.float32)))
    assert abs(t[0, 0]) < abs(i[0, 0])
    # TIR returns zero vector
    t2 = np.asarray(bsdf.refract(
        jnp.asarray([[0.99, 0.0, -0.14106736]], jnp.float32), n,
        jnp.asarray([1.5], jnp.float32)))
    np.testing.assert_allclose(t2, 0.0, atol=1e-7)


def test_quat_rotate_from_z():
    dest = jnp.asarray([[0.0, 1.0, 0.0], [0, 0, 1], [0, 0, -1]], jnp.float32)
    p = jnp.asarray([[0.0, 0, 1], [0, 0, 1], [0, 0, 1]], jnp.float32)
    out = np.asarray(bsdf.quat_rotate_from_z(dest, p))
    np.testing.assert_allclose(out[0], [0, 1, 0], atol=1e-6)   # z -> y
    np.testing.assert_allclose(out[1], [0, 0, 1], atol=1e-6)   # identity
    np.testing.assert_allclose(out[2], [0, 0, -1], atol=1e-6)  # opposite


def test_scatter_rng_stream_parity():
    """Diffuse lanes must consume exactly 3 variates, specular exactly 1."""
    seed = jnp.asarray([123, 123], np.uint32)
    direction = jnp.asarray([[0, 0, -1.0]] * 2, jnp.float32)
    color = jnp.ones((2, 3), jnp.float32)
    pos = jnp.zeros((2, 3), jnp.float32)
    nrm = jnp.asarray([[0, 0, 1.0]] * 2, jnp.float32)
    refl = jnp.asarray([0.0, 1.0], jnp.float32)   # lane0 diffuse, lane1 mirror
    refr = jnp.zeros(2, jnp.float32)
    ior = jnp.ones(2, jnp.float32)
    spec = jnp.full((2, 3), 0.5, jnp.float32)
    active = jnp.asarray([True, True])
    out_seed, o, d, c, diff, specf = bsdf.scatter_ray(
        seed, direction, color, pos, nrm, refl, refr, ior, spec, active)
    s = 123
    for _ in range(3):
        s, _ = _ref_next_rand(s)
    assert int(out_seed[0]) == s                    # 3 draws
    s1, _ = _ref_next_rand(123)
    assert int(out_seed[1]) == s1                   # 1 draw
    assert bool(diff[0]) and not bool(diff[1])
    assert bool(specf[1]) and not bool(specf[0])
    np.testing.assert_allclose(np.asarray(c[1]), 0.5, atol=1e-6)


# ---------------- camera ----------------

def test_orbit_camera_cornell():
    from ptdn_tpu.scene import Scene

    s = Scene(scene_path_str + "/cornell.txt")
    cam = OrbitCamera(s.camera)
    fr = cam.frame()
    # cornell: EYE (0,5,10.5) LOOKAT (0,5,0) -> reconstruction is exact
    np.testing.assert_allclose(fr.position, [0, 5, 10.5], atol=1e-5)
    np.testing.assert_allclose(fr.view, [0, 0, -1], atol=1e-6)
    o, d = generate_camera_rays(fr.as_pytree(), s.resolution)
    w, h = s.resolution
    assert o.shape == (w * h, 3)
    center = np.asarray(d[(h // 2) * w + w // 2])
    # central pixel looks nearly along view
    assert center @ np.array([0, 0, -1]) > 0.999


def test_view_matrix_roundtrip():
    from ptdn_tpu.scene import Scene

    s = Scene(scene_path_str + "/cornell.txt")
    fr = OrbitCamera(s.camera).frame()
    vm = view_matrix(fr)
    p_world = np.array([1.0, 2.0, -3.0, 1.0], np.float32)
    p_view = vm @ p_world
    # camera position maps to origin
    pc = vm @ np.array([*fr.position, 1.0], np.float32)
    np.testing.assert_allclose(pc[:3], 0, atol=1e-5)
    # a point 1 unit along view maps to z = +1 (basis column convention)
    pv = vm @ np.array([*(fr.position + fr.view), 1.0], np.float32)
    np.testing.assert_allclose(pv[:3], [0, 0, 1], atol=1e-5)


def test_sparse_gather_compaction():
    """Row-compaction sparse gather (ops/pallas/compact.py) must equal a
    dense masked gather for every density regime, including per-row
    overflow into higher tiers and the dense fallback."""
    import jax
    import jax.numpy as jnp

    from ptdn_tpu.ops.pallas.compact import sparse_gather

    rng = np.random.default_rng(3)
    T = 5000
    table = jnp.asarray(
        rng.integers(0, 2 ** 24, size=(T,), dtype=np.int64).astype(np.int32))
    R = 16
    for frac in (0.0, 0.05, 0.3, 0.8, 1.0):
        mask = rng.random((R, 128)) < frac
        idxn = np.where(mask, rng.integers(0, T, size=(R, 128)), -1)
        idx = jnp.asarray(idxn.astype(np.int32))
        out = np.asarray(sparse_gather(table, idx, 8, interpret=True))
        ref = np.where(mask, np.asarray(table)[np.maximum(idxn, 0)], 0)
        assert np.array_equal(out, ref), f"frac={frac}"


def test_compact_rows_slots():
    """compact_rows_pallas routing: slot p of each row holds the p-th
    valid lane's value; slots beyond the count are zero."""
    import jax.numpy as jnp

    from ptdn_tpu.ops.pallas.compact import compact_rows_pallas

    rng = np.random.default_rng(4)
    idxn = np.where(rng.random((8, 128)) < 0.2,
                    rng.integers(0, 999, size=(8, 128)), -1)
    cidx, slot, count = compact_rows_pallas(
        jnp.asarray(idxn.astype(np.int32)), 128, interpret=True)
    cidx, slot, count = map(np.asarray, (cidx, slot, count))
    for r in range(8):
        vals = idxn[r][idxn[r] >= 0]
        assert count[r, 0] == len(vals)
        assert np.array_equal(cidx[r, :len(vals)], vals)
        assert (cidx[r, len(vals):] == 0).all()
        assert np.array_equal(slot[r][idxn[r] >= 0], np.arange(len(vals)))


def test_mesh_compact_path_parity():
    """The compacted per-chunk mesh path (n_chunks > 4: per-lane window
    cull + tile-wide ray compaction) must agree with the XLA oracle
    intersector on a mesh-heavy scene."""
    import jax.numpy as jnp

    from ptdn_tpu.engine import wavefront as WF
    from ptdn_tpu.scene import Scene
    from ptdn_tpu.utils.config import RenderConfig

    scene = Scene(scene_path_str + "/bunny.txt")
    assert scene.n_tris > 512  # exercises the compacted (>4 chunks) path
    ds = scene.device()
    isect_p = WF.make_intersector(scene, RenderConfig(backend="pallas"))
    isect_x = WF.make_intersector(scene, RenderConfig(backend="xla"))
    rng = np.random.default_rng(2)
    n = 1024
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    a = isect_p(ds, o, d)
    b = isect_x(ds, o, d)
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               atol=1e-4, rtol=1e-5)
    assert np.array_equal(np.asarray(a["geom_id"]), np.asarray(b["geom_id"]))

    # shadow visibility on the same rays: any-hit vs oracle-derived
    vis_p = WF.make_light_visibility(scene, RenderConfig(backend="pallas"))
    lit = np.asarray(vis_p(ds, o, d))
    assert lit.dtype == np.bool_ and lit.shape == (n,)
    hit_light = np.asarray(b["geom_id"]) == 0
    assert np.array_equal(lit, hit_light)


def test_interpolate_compat_false_fixes_normal_weights():
    """compat=False uses TRUE barycentric weights for the smoothed
    normal; compat=True replicates the reference's swapped ones
    (sceneStructs.h:162-170). At a vertex, the fixed mode must return
    that vertex's normal; the compat mode returns a different one."""
    import jax.numpy as jnp

    from ptdn_tpu.ops.intersect import interpolate_tri_hit

    n0 = jnp.array([[1.0, 0, 0]]); n1 = jnp.array([[0, 1.0, 0]])
    n2 = jnp.array([[0, 0, 1.0]])
    uv0 = jnp.array([[0.0, 0]]); uv1 = jnp.array([[1.0, 0]])
    uv2 = jnp.array([[0.0, 1]])
    # hit exactly at vertex 1: u=1, v=0
    u = jnp.array([1.0]); v = jnp.array([0.0])
    n_fix, uv_fix = interpolate_tri_hit(u, v, n0, n1, n2, uv0, uv1, uv2,
                                        compat=False)
    n_ref, uv_ref = interpolate_tri_hit(u, v, n0, n1, n2, uv0, uv1, uv2,
                                        compat=True)
    np.testing.assert_allclose(np.asarray(n_fix[0]), [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n_ref[0]), [1, 0, 0], atol=1e-6)
    # uv interpolation is NOT part of the quirk: identical either way
    np.testing.assert_allclose(np.asarray(uv_fix), np.asarray(uv_ref))
