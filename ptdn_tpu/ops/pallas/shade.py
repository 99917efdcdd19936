"""Pallas TPU kernel: fused per-bounce shading + NEE sampling + scatter.

One launch replaces the bounce loop's XLA glue (the body of `rt`,
reference src/pathtrace.cu:325-394, minus the intersections): per-lane
TEA re-seed, emissive termination, albedo modulation, shadow-ray disk
sampling (computeShadowRay, pathtrace.cu:284-297), and scatterRay's
refract/reflect/diffuse logic (interactions.h:94-136) — with the exact
masked LCG draw sites so variate streams stay bit-identical to CUDA
threads.

Material properties are baked in as static per-material constants and
resolved per lane with an unrolled select chain (M <= ~16 materials), so
the kernel does no table memory traffic at all. Texture-resolved albedo
is computed outside and passed in (texture fetches are gathers, which
don't vectorize on TPU).

I/O is one stacked plane array each way ((K, NB, 128) f32) to keep the
kernel signature small; the engine reshapes its flat SoA state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RROWS = 8
TWO_PI = 6.2831853071795864769
SQRT_ONE_THIRD = 0.5773502691896257645

# input plane indices
(I_OX, I_OY, I_OZ, I_DX, I_DY, I_DZ, I_T, I_NX, I_NY, I_NZ,
 I_AR, I_AG, I_AB, I_TR, I_TG, I_TB, I_RR, I_RG, I_RB,
 I_MAT, I_ACT, I_DIF) = range(22)
N_IN = 22
# output plane indices
(O_DX, O_DY, O_DZ, O_SPX, O_SPY, O_SPZ, O_TR, O_TG, O_TB,
 O_RR, O_RG, O_RB, O_DIF, O_ACT, O_SDX, O_SDY, O_SDZ,
 O_CR, O_CG, O_CB, O_NEE) = range(21)
N_OUT = 21


def _tea(v0, v1, rounds: int = 16):
    """initRand (interactions.h:10-22) on uint32 tiles."""
    s0 = jnp.uint32(0)
    for _ in range(rounds):
        s0 = s0 + jnp.uint32(0x9E3779B9)
        v0 = v0 + ((((v1 << 4) + jnp.uint32(0xA341316C)) ^ (v1 + s0))
                   ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4)))
        v1 = v1 + ((((v0 << 4) + jnp.uint32(0xAD90777D)) ^ (v0 + s0))
                   ^ ((v0 >> 5) + jnp.uint32(0x7E95761E)))
    return v0


def _lcg(seed):
    seed = jnp.uint32(1664525) * seed + jnp.uint32(1013904223)
    # Mosaic can't cast u32->f32 directly; the low 24 bits fit in i32
    low = (seed & jnp.uint32(0x00FFFFFF)).astype(jnp.int32)
    val = low.astype(jnp.float32) * (1.0 / float(0x01000000))
    return seed, val


def _lcg_masked(seed, mask):
    ns, val = _lcg(seed)
    return jnp.where(mask, ns, seed), val


def _select_mat(mat_id, consts):
    """Unrolled per-material constant select (consts: tuple per mat)."""
    out = jnp.full(mat_id.shape, consts[0], jnp.float32)
    for m in range(1, len(consts)):
        out = jnp.where(mat_id == float(m), consts[m], out)
    return out


def shade_tiles(tiles, seed, par, *, mats, shadow_ray: bool,
                reduce_var: bool):
    """The whole per-bounce shade body on [RROWS, 128] tiles: emissive
    termination, albedo modulation, NEE disk sampling, scatterRay.
    `tiles` is a dict keyed like the I_* plane names; `par` is the
    (ltx, lty, ltz, lrad, sint, alb_skip) scalar tuple. Returns a dict
    keyed like the O_* plane names (masks as f32). Shared by the
    standalone shade kernel and the fused bounce kernel."""
    ox, oy, oz = tiles["ox"], tiles["oy"], tiles["oz"]
    dx, dy, dz = tiles["dx"], tiles["dy"], tiles["dz"]
    t = tiles["t"]
    nx, ny, nz = tiles["nx"], tiles["ny"], tiles["nz"]
    ar, ag, ab = tiles["ar"], tiles["ag"], tiles["ab"]
    tr, tg, tb = tiles["tr"], tiles["tg"], tiles["tb"]
    rr, rg, rb = tiles["rr"], tiles["rg"], tiles["rb"]
    mat = tiles["mat"]
    active = tiles["act"] > 0.5
    diffuse_flag = tiles["dif"] > 0.5
    shape = ox.shape
    (ltx, lty, ltz, lrad, sint, alb_skip_s) = par

    # ---- material constants (static tables) ----
    m_emit = _select_mat(mat, mats["emit"])
    m_refl = _select_mat(mat, mats["refl"])
    m_refr = _select_mat(mat, mats["refr"])
    m_ior = _select_mat(mat, mats["ior"])
    m_scr = _select_mat(mat, mats["spec_r"])
    m_scg = _select_mat(mat, mats["spec_g"])
    m_scb = _select_mat(mat, mats["spec_b"])
    m_cr = _select_mat(mat, mats["col_r"])
    m_cg = _select_mat(mat, mats["col_g"])
    m_cb = _select_mat(mat, mats["col_b"])

    emissive = m_emit > 0.0
    add_emit = active & emissive
    if shadow_ray and reduce_var:
        add_emit = add_emit & ~diffuse_flag
    add_f = jnp.where(add_emit, 1.0, 0.0)
    # emissive contribution kept separately ("er/eg/eb") for consumers
    # that defer texture modulation (ops/pallas/path.py); rr/rg/rb stay
    # the accumulated radiance for the per-bounce kernels
    er = add_f * tr * m_cr * m_emit
    eg = add_f * tg * m_cg * m_emit
    eb = add_f * tb * m_cb * m_emit
    rr = rr + er
    rg = rg + eg
    rb = rb + eb
    active = active & ~emissive

    # hit point + spawn origin (+1e-4 n, pathtrace.cu:338/interactions.h:104)
    ipx = ox + t * dx
    ipy = oy + t * dy
    ipz = oz + t * dz
    spx = ipx + 1e-4 * nx
    spy = ipy + 1e-4 * ny
    spz = ipz + 1e-4 * nz

    # ---- throughput *= albedo (pathtrace.cu:343-355) ----
    alb_skip = alb_skip_s > 0.5         # sepcolor && denoise && depth == 1
    apply_alb = active & ~alb_skip
    af = jnp.where(apply_alb, 1.0, 0.0)
    tr = tr * (1.0 + af * (ar - 1.0))
    tg = tg * (1.0 + af * (ag - 1.0))
    tb = tb * (1.0 + af * (ab - 1.0))

    mat_is_diffuse = (m_refl < 1e-6) & (m_refr < 1e-6)

    out = {}
    # ---- NEE shadow ray sampling (pathtrace.cu:284-297, 357-366) ----
    if shadow_ray:
        nee = active & mat_is_diffuse
        tcx = ltx - spx
        tcy = lty - spy
        tcz = ltz - spz
        tcn = 1.0 / jnp.sqrt(tcx * tcx + tcy * tcy + tcz * tcz)
        tcx, tcy, tcz = tcx * tcn, tcy * tcn, tcz * tcn
        seed, r_th = _lcg_masked(seed, nee)
        theta = TWO_PI * r_th
        pxx = jnp.cos(theta)
        pyy = jnp.sin(theta)
        # rotate (cos,sin,0) by glm::rotation((0,0,1), dir_to_center):
        # q = (w, (-ty, tx, 0)*invs), w = s/2 (quaternion.inl:248-283)
        cos_t = tcz
        opposite = cos_t < -1.0 + 1.1920929e-07
        s_ = jnp.sqrt(jnp.maximum((1.0 + cos_t) * 2.0, 1e-30))
        invs = 1.0 / s_
        qw = jnp.where(opposite, 0.0, 0.5 * s_)
        qx = jnp.where(opposite, 0.0, -tcy * invs)
        qy = jnp.where(opposite, -1.0, tcx * invs)
        # rotated = p + 2*qw*(q x p) + 2*(q x (q x p)); qz = 0, pz = 0
        # q x p = (qy*0 - 0*pyy, 0*pxx - qx*0, qx*pyy - qy*pxx)
        cpz = qx * pyy - qy * pxx
        # u = q x p = (0, 0, cpz); q x u = (qy*cpz, -qx*cpz, 0)
        sdx = pxx + 2.0 * (qw * 0.0 + qy * cpz)
        sdy = pyy + 2.0 * (qw * 0.0 - qx * cpz)
        sdz = 0.0 + 2.0 * (qw * cpz + 0.0)
        seed, r_rad = _lcg_masked(seed, nee)
        smpx = ltx + sdx * (r_rad * lrad)
        smpy = lty + sdy * (r_rad * lrad)
        smpz = ltz + sdz * (r_rad * lrad)
        dxs = smpx - spx
        dys = smpy - spy
        dzs = smpz - spz
        sdist2 = dxs * dxs + dys * dys + dzs * dzs
        sdn = 1.0 / jnp.sqrt(sdist2)
        sdx, sdy, sdz = dxs * sdn, dys * sdn, dzs * sdn
        lambert = jnp.maximum(0.0, sdx * nx + sdy * ny + sdz * nz)
        scale = sint / sdist2 * lambert
        neef = jnp.where(nee, 1.0, 0.0)
        out["sdx"] = sdx
        out["sdy"] = sdy
        out["sdz"] = sdz
        out["cr"] = tr * scale * neef
        out["cg"] = tg * scale * neef
        out["cb"] = tb * scale * neef
        out["nee"] = neef
    else:
        zero = jnp.zeros(shape, jnp.float32)
        out["sdx"] = zero
        out["sdy"] = zero
        out["sdz"] = zero
        out["cr"] = zero
        out["cg"] = zero
        out["cb"] = zero
        out["nee"] = zero

    # ---- scatterRay (interactions.h:94-136) ----
    is_refr = m_refr != 0.0
    seed, r1 = _lcg_masked(seed, active)
    proj = dx * nx + dy * ny + dz * nz
    eta = jnp.where(proj > 0.0, m_ior, 1.0 / m_ior)
    r0 = ((1.0 - eta) / (1.0 + eta)) ** 2
    schlick = r0 + (1.0 - r0) * (1.0 - jnp.abs(proj)) ** 5
    do_refract = is_refr & (schlick < r1)
    # glm::refract
    k = 1.0 - eta * eta * (1.0 - proj * proj)
    ksafe = jnp.sqrt(jnp.maximum(k, 0.0))
    fr = eta * proj + ksafe
    rfx = eta * dx - fr * nx
    rfy = eta * dy - fr * ny
    rfz = eta * dz - fr * nz
    tir = k < 0.0
    rfx = jnp.where(tir, 0.0, rfx)
    rfy = jnp.where(tir, 0.0, rfy)
    rfz = jnp.where(tir, 0.0, rfz)
    # reflect
    two_d_n = 2.0 * proj
    rlx = dx - two_d_n * nx
    rly = dy - two_d_n * ny
    rlz = dz - two_d_n * nz
    do_reflect = (is_refr & ~do_refract) | (~is_refr & (r1 < m_refl))
    # diffuse: two more draws
    is_diffuse = ~is_refr & ~(r1 < m_refl)
    seed, r_up = _lcg_masked(seed, active & is_diffuse)
    seed, r_ar = _lcg_masked(seed, active & is_diffuse)
    up = jnp.sqrt(r_up)
    over = jnp.sqrt(1.0 - up * up)
    around = r_ar * TWO_PI
    # directionNotNormal (interactions.h:49-56)
    use_x = jnp.abs(nx) < SQRT_ONE_THIRD
    use_y = ~use_x & (jnp.abs(ny) < SQRT_ONE_THIRD)
    dnnx = jnp.where(use_x, 1.0, 0.0)
    dnny = jnp.where(use_y, 1.0, 0.0)
    dnnz = jnp.where(~use_x & ~use_y, 1.0, 0.0)
    # p1 = normalize(cross(n, dnn)); p2 = normalize(cross(n, p1))
    p1x = ny * dnnz - nz * dnny
    p1y = nz * dnnx - nx * dnnz
    p1z = nx * dnny - ny * dnnx
    p1n = 1.0 / jnp.sqrt(p1x * p1x + p1y * p1y + p1z * p1z)
    p1x, p1y, p1z = p1x * p1n, p1y * p1n, p1z * p1n
    p2x = ny * p1z - nz * p1y
    p2y = nz * p1x - nx * p1z
    p2z = nx * p1y - ny * p1x
    p2n = 1.0 / jnp.sqrt(p2x * p2x + p2y * p2y + p2z * p2z)
    p2x, p2y, p2z = p2x * p2n, p2y * p2n, p2z * p2n
    ca = jnp.cos(around) * over
    sa = jnp.sin(around) * over
    dfx = up * nx + ca * p1x + sa * p2x
    dfy = up * ny + ca * p1y + sa * p2y
    dfz = up * nz + ca * p1z + sa * p2z

    ndx = jnp.where(do_refract, rfx, jnp.where(do_reflect, rlx, dfx))
    ndy = jnp.where(do_refract, rfy, jnp.where(do_reflect, rly, dfy))
    ndz = jnp.where(do_refract, rfz, jnp.where(do_reflect, rlz, dfz))
    rf = jnp.where(active & do_reflect, 1.0, 0.0)
    ntr = tr * (1.0 + rf * (m_scr - 1.0))
    ntg = tg * (1.0 + rf * (m_scg - 1.0))
    ntb = tb * (1.0 + rf * (m_scb - 1.0))
    actf = jnp.where(active, 1.0, 0.0)
    out["dx"] = actf * ndx + (1.0 - actf) * dx
    out["dy"] = actf * ndy + (1.0 - actf) * dy
    out["dz"] = actf * ndz + (1.0 - actf) * dz
    out["spx"] = actf * spx + (1.0 - actf) * ox
    out["spy"] = actf * spy + (1.0 - actf) * oy
    out["spz"] = actf * spz + (1.0 - actf) * oz
    out["tr"] = jnp.where(active, ntr, tr)
    out["tg"] = jnp.where(active, ntg, tg)
    out["tb"] = jnp.where(active, ntb, tb)
    out["rr"] = rr
    out["rg"] = rg
    out["rb"] = rb
    out["er"] = er
    out["eg"] = eg
    out["eb"] = eb
    out["dif"] = jnp.where(diffuse_flag | (active & is_diffuse), 1.0, 0.0)
    out["act"] = jnp.where(active, 1.0, 0.0)
    return out


_IN_KEYS = ("ox", "oy", "oz", "dx", "dy", "dz", "t", "nx", "ny", "nz",
            "ar", "ag", "ab", "tr", "tg", "tb", "rr", "rg", "rb",
            "mat", "act", "dif")
_OUT_KEYS = ("dx", "dy", "dz", "spx", "spy", "spz", "tr", "tg", "tb",
             "rr", "rg", "rb", "dif", "act", "sdx", "sdy", "sdz",
             "cr", "cg", "cb", "nee")


def lane_seed(block_index, fd, shape, base=0):
    """Per-lane TEA seed: initRand(pixelIdx, frame+depth)
    (pathtrace.cu:328) for ray block `block_index`. `base` is the global
    lane offset of this kernel invocation's first lane (nonzero on
    multi-chip shards, parallel/sharded.py)."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    lane = (block_index * (shape[0] * 128) + row * 128 + col).astype(
        jnp.uint32) + jnp.asarray(base, jnp.uint32)
    return _tea(lane, jnp.full(shape, fd, jnp.uint32))


def pix_seed(pix_f, fd, shape, base=0):
    """Per-lane TEA seed from an explicit pixel-index plane (f32 values,
    exact for indices < 2^24). The sorted-wavefront engine permutes
    lanes into coherence order between bounces, so the RNG stream must
    follow the PIXEL, not the lane position
    (initRand(pixelIdx, frame+depth), pathtrace.cu:328)."""
    pix = (pix_f.astype(jnp.int32).astype(jnp.uint32)
           + jnp.asarray(base, jnp.uint32))
    return _tea(pix, jnp.full(shape, fd, jnp.uint32))


def _kernel(inp, par_ref, fd_ref, out,
            *, mats, shadow_ray: bool, reduce_var: bool, n_block: int,
            has_pix: bool = False):
    shape = (RROWS, 128)
    i = pl.program_id(0)
    tiles = {k: inp[j] for j, k in enumerate(_IN_KEYS)}
    if has_pix:
        # sorted-wavefront mode: plane N_IN carries the pixel index
        seed = pix_seed(inp[N_IN], fd_ref[0, 0], shape, fd_ref[0, 1])
    else:
        seed = lane_seed(i, fd_ref[0, 0], shape, fd_ref[0, 1])
    par = tuple(par_ref[0, j] for j in range(6))
    res = shade_tiles(tiles, seed, par, mats=mats, shadow_ray=shadow_ray,
                      reduce_var=reduce_var)
    for j, k in enumerate(_OUT_KEYS):
        out[j] = res[k]


def _fd2(frame_plus_depth):
    """(1|2,) u32 -> (1, 2) [frame+depth, lane_base] SMEM payload."""
    v = frame_plus_depth.reshape(-1)
    if v.shape[0] == 1:
        v = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
    return v.reshape(1, 2)


def shade_bounce_pallas(planes_in, params_vec, frame_plus_depth,
                        mats, shadow_ray: bool, reduce_var: bool,
                        interpret: bool = False):
    """planes_in: (N_IN, NB, 128) f32 — or (N_IN+1, ...) with a trailing
    pixel-index plane (sorted-wavefront mode). params_vec: (8,) f32.
    Returns (N_OUT, NB, 128) f32."""
    nb = planes_in.shape[1]
    has_pix = planes_in.shape[0] == N_IN + 1
    n_in = N_IN + (1 if has_pix else 0)
    kern = functools.partial(_kernel, mats=mats, shadow_ray=shadow_ray,
                             reduce_var=reduce_var, n_block=nb,
                             has_pix=has_pix)
    out = pl.pallas_call(
        kern,
        grid=(nb // RROWS,),
        in_specs=[
            pl.BlockSpec((n_in, RROWS, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((N_OUT, RROWS, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_OUT, nb, 128), jnp.float32),
        interpret=interpret,
    )(planes_in, params_vec.reshape(1, 8),
      _fd2(frame_plus_depth))
    return out
