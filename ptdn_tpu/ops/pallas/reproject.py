"""Pallas TPU kernel: fused temporal reprojection for near-identity motion.

One launch = the whole SVGF BackProjection pass (reference
src/denoise.cu:185-317) for the |reprojected base - pixel| <= 1 case —
every static-camera frame plus sub-pixel motion.  It is the Pallas twin
of `denoise.reproject.back_projection_stencil` (same tap values, same
math, parity-tested bit-for-bit on CPU interpret mode): every 3x3-window
tap lies in a static +-3 neighborhood, so the prev-frame fetch is 9
shared base-offset masks x shifted-view FMAs with ZERO gathers.

Why a kernel when the XLA stencil already exists: in-frame the XLA
version costs ~2.4 ms (vs 1.3 standalone) — its 81 masked shifted-view
FMAs over 10 channels give XLA a poor fusion context between the path
kernel and the a-trous levels.  Here the whole pass runs strip-by-strip
out of VMEM with one DMA per input pack and one per output pack.

Layout: prev-frame state is packed into 10 planes (color history rgb,
moments m1/m2, history length, prev normal xyz, prev geom id as f32 with
-1 borders — the same padding contract as the XLA paths), rows padded by
an 8-row halo.  Current-frame state is 10 planes (raw color rgb,
position xyz, normal xyz, geom id).  The previous view matrix and the
alpha floors ride in SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIP = 64
HALO = 8          # taps reach +-3 rows; rounded up to the 8-sublane tile

# prev pack plane indices
_PR, _PG, _PB, _M1, _M2, _PH, _PNX, _PNY, _PNZ, _PGEOM = range(10)
# curr pack plane indices
_CR, _CG, _CB, _PX, _PY, _PZ, _NX, _NY, _NZ, _GEOM = range(10)


def _roll_cols(img, dx: int):
    if dx == 0:
        return img
    return pltpu.roll(img, shift=(-dx) % img.shape[-1], axis=1)


def _kernel(prev_hbm, curr_hbm, view_ref, alpha_ref, out_f, out_h,
            pbuf, cbuf, sems, *, h: int, w: int, wp: int):
    i = pl.program_id(0)
    rows = STRIP + 2 * HALO

    cp_p = pltpu.make_async_copy(
        prev_hbm.at[:, pl.ds(i * STRIP, rows), :], pbuf, sems.at[0])
    cp_c = pltpu.make_async_copy(
        curr_hbm.at[:, pl.ds(i * STRIP, STRIP), :], cbuf, sems.at[1])
    cp_p.start()
    cp_c.start()
    cp_p.wait()
    cp_c.wait()

    def curr(p):
        return cbuf[p]

    # ---- reprojection base (denoise.cu:195-217, incl. the omitted
    # tan(fov/2) quirk — see denoise.reproject._reproj_base) ----
    px, py, pz = curr(_PX), curr(_PY), curr(_PZ)
    vsx = view_ref[0, 0] * px + view_ref[0, 1] * py + view_ref[0, 2] * pz \
        + view_ref[0, 3]
    vsy = view_ref[1, 0] * px + view_ref[1, 1] * py + view_ref[1, 2] * pz \
        + view_ref[1, 3]
    vsz = view_ref[2, 0] * px + view_ref[2, 1] * py + view_ref[2, 2] * pz \
        + view_ref[2, 3]
    prevx = (-(vsx / vsz) * 0.5 + 0.5) * w - 0.5
    prevy = (-(vsy / vsz) * 0.5 + 0.5) * h - 0.5
    floorx = jnp.floor(prevx)
    floory = jnp.floor(prevy)
    fracx = prevx - floorx
    fracy = prevy - floory
    fx = floorx.astype(jnp.int32)
    fy = floory.astype(jnp.int32)
    base_valid = ((floorx >= 0) & (floory >= 0)
                  & (floorx < w) & (floory < h))

    iy = jax.lax.broadcasted_iota(jnp.int32, (STRIP, wp), 0) + i * STRIP
    ix = jax.lax.broadcasted_iota(jnp.int32, (STRIP, wp), 1)
    ey = jnp.clip(fy - iy, -1, 1)
    ex = jnp.clip(fx - ix, -1, 1)
    masks = {(a, b): ((ey == a) & (ex == b)).astype(jnp.float32)
             for a in (-1, 0, 1) for b in (-1, 0, 1)}

    # prev planes shifted by every needed column offset (-3..3), rows
    # sliced on demand (strip-local row r == global row i*STRIP + r - HALO)
    def prev(p, oy: int, ox: int):
        sl = pbuf[p, HALO + oy: HALO + oy + STRIP, :]
        return _roll_cols(sl, ox)

    cn = (curr(_NX), curr(_NY), curr(_NZ))
    geo_f = curr(_GEOM)

    # tap (dy,dx) -> (10 value planes, validity)
    taps = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            vals = []
            for p in range(10):
                acc = jnp.zeros((STRIP, wp), jnp.float32)
                for (a, b), m in masks.items():
                    acc = acc + m * prev(p, dy + a, dx + b)
                vals.append(acc)
            qx = fx + dx
            qy = fy + dy
            inb = (qx >= 0) & (qx < w) & (qy >= 0) & (qy < h)
            pg = vals[_PGEOM]
            same = (pg != -1.0) & (pg == geo_f)
            dnx = vals[_PNX] - cn[0]
            dny = vals[_PNY] - cn[1]
            dnz = vals[_PNZ] - cn[2]
            nd = jnp.sqrt(dnx * dnx + dny * dny + dnz * dnz)
            taps[(dy, dx)] = (vals, inb & same & (nd <= 0.1))

    # ---- 2x2 bilinear + 3x3 fallback + EWMA + rejection
    # (denoise.cu:219-315; mirrors _accumulate_from_taps) ----
    quad = [((0, 0), (1.0 - fracx) * (1.0 - fracy)),
            ((1, 0), fracx * (1.0 - fracy)),
            ((0, 1), (1.0 - fracx) * fracy),
            ((1, 1), fracx * fracy)]
    all_valid = base_valid
    for (dx, dy), _ in quad:
        all_valid = all_valid & taps[(dy, dx)][1]

    zero = jnp.zeros((STRIP, wp), jnp.float32)
    pc = [zero, zero, zero]
    pm = [zero, zero]
    ph = zero
    sumw = zero
    for (dx, dy), wgt in quad:
        a, v = taps[(dy, dx)]
        mw = jnp.where(all_valid & v, wgt, 0.0)
        pc = [pc[0] + mw * a[_PR], pc[1] + mw * a[_PG], pc[2] + mw * a[_PB]]
        pm = [pm[0] + mw * a[_M1], pm[1] + mw * a[_M2]]
        ph = ph + mw * a[_PH]
        sumw = sumw + mw
    bilinear_ok = all_valid & (sumw >= 0.01)
    safe = jnp.maximum(sumw, 1e-20)
    pc_b = [c / safe for c in pc]
    pm_b = [m / safe for m in pm]
    ph_b = ph / safe

    fc = [zero, zero, zero]
    fm = [zero, zero]
    fh = zero
    cnt = zero
    for (dy, dx), (a, v) in taps.items():
        mv = jnp.where(v, 1.0, 0.0)
        fc = [fc[0] + mv * a[_PR], fc[1] + mv * a[_PG], fc[2] + mv * a[_PB]]
        fm = [fm[0] + mv * a[_M1], fm[1] + mv * a[_M2]]
        fh = fh + mv * a[_PH]
        cnt = cnt + mv
    fallback_ok = jnp.logical_not(bilinear_ok) & (cnt > 0)
    safe_cnt = jnp.maximum(cnt, 1e-20)
    pc = [jnp.where(bilinear_ok, b, f / safe_cnt) for b, f in zip(pc_b, fc)]
    pm = [jnp.where(bilinear_ok, b, f / safe_cnt) for b, f in zip(pm_b, fm)]
    ph = jnp.where(bilinear_ok, ph_b, fh / safe_cnt)

    # the EWMA alpha uses the UN-reprojected history length of this
    # pixel (denoise.cu:297): plane _PH of the unshifted prev pack
    n_hist = pbuf[_PH, HALO: HALO + STRIP, :]

    valid = ((bilinear_ok | fallback_ok) & (n_hist > 0.0)
             & (geo_f != -1.0))

    cr, cg, cb = curr(_CR), curr(_CG), curr(_CB)
    lum = 0.2126 * cr + 0.7152 * cg + 0.0722 * cb
    color_alpha = jnp.maximum(1.0 / (n_hist + 1.0), alpha_ref[0, 0])
    moment_alpha = jnp.maximum(1.0 / (n_hist + 1.0), alpha_ref[0, 1])
    acc_r = cr * color_alpha + pc[0] * (1.0 - color_alpha)
    acc_g = cg * color_alpha + pc[1] * (1.0 - color_alpha)
    acc_b = cb * color_alpha + pc[2] * (1.0 - color_alpha)
    m1 = moment_alpha * pm[0] + (1.0 - moment_alpha) * lum
    m2 = moment_alpha * pm[1] + (1.0 - moment_alpha) * lum * lum
    var = jnp.maximum(m2 - m1 * m1, 0.0)

    out_f[0] = jnp.where(valid, var, 100.0)
    out_f[1] = jnp.where(valid, acc_r, cr)
    out_f[2] = jnp.where(valid, acc_g, cg)
    out_f[3] = jnp.where(valid, acc_b, cb)
    out_f[4] = jnp.where(valid, m1, lum)
    out_f[5] = jnp.where(valid, m2, lum * lum)
    out_h[:] = jnp.where(valid, ph.astype(jnp.int32) + 1, 1)


def back_projection_stencil_pallas(res, current_color, curr_gb, prev_gb,
                                   prev_viewmat, color_history,
                                   moment_history, history_length,
                                   color_alpha_min, moment_alpha_min,
                                   interpret: bool = False):
    """Drop-in twin of `denoise.reproject.back_projection_stencil`.
    Caller must gate on |reprojected base - pixel| <= 1 (see
    back_projection_auto).  Returns (variance, color_acc, moment_acc,
    history_update)."""
    w, h = res
    wp = -(-w // 128) * 128
    hp = -(-h // STRIP) * STRIP

    prev = jnp.stack([
        color_history[..., 0], color_history[..., 1], color_history[..., 2],
        moment_history[..., 0], moment_history[..., 1],
        history_length.astype(jnp.float32),
        prev_gb["normal"][..., 0], prev_gb["normal"][..., 1],
        prev_gb["normal"][..., 2],
        prev_gb["geom_id"].astype(jnp.float32),
    ])
    prev = jnp.pad(prev, ((0, 0), (HALO, HALO + hp - h), (0, wp - w)))
    # padding contract: out-of-image geom id = -1 (rows; wrapped columns
    # and beyond-w lanes are rejected by the in-bounds tap test)
    prev = prev.at[_PGEOM, :HALO, :].set(-1.0)
    prev = prev.at[_PGEOM, HALO + h:, :].set(-1.0)

    curr = jnp.stack([
        current_color[..., 0], current_color[..., 1], current_color[..., 2],
        curr_gb["position"][..., 0], curr_gb["position"][..., 1],
        curr_gb["position"][..., 2],
        curr_gb["normal"][..., 0], curr_gb["normal"][..., 1],
        curr_gb["normal"][..., 2],
        curr_gb["geom_id"].astype(jnp.float32),
    ])
    curr = jnp.pad(curr, ((0, 0), (0, hp - h), (0, wp - w)))
    curr = curr.at[_GEOM, h:, :].set(-1.0)

    view = prev_viewmat[:3, :].astype(jnp.float32)          # (3, 4) SMEM
    alphas = jnp.stack([jnp.float32(color_alpha_min),
                        jnp.float32(moment_alpha_min)]).reshape(1, 2)

    rows = STRIP + 2 * HALO
    kern = functools.partial(_kernel, h=h, w=w, wp=wp)
    out_f, out_h = pl.pallas_call(
        kern,
        grid=(hp // STRIP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),           # prev pack
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),           # curr pack
            pl.BlockSpec((3, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((6, STRIP, wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((STRIP, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((10, rows, wp), jnp.float32),
            pltpu.VMEM((10, STRIP, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prev, curr, view, alphas)

    variance = out_f[0, :h, :w]
    color_acc = jnp.moveaxis(out_f[1:4, :h, :w], 0, -1)
    moment_acc = jnp.moveaxis(out_f[4:6, :h, :w], 0, -1)
    history_update = out_h[:h, :w]
    return variance, color_acc, moment_acc, history_update
