"""Pallas TPU kernel: temporal reprojection FUSED with à-trous level 1.

One launch = the SVGF BackProjection pass (reference src/denoise.cu:185-317)
for the near-identity-motion case PLUS the first ATrousFilter level
(denoise.cu:77-170, step=2).  With the default ``history_level == 1`` the
intermediate accumulated color exists only long enough to be filtered —
fusing the two kernels means it never round-trips HBM at all: the
reprojection result is produced strip-by-strip in VMEM scratch and consumed
by the level-1 taps in the same grid step.

vs the split pipeline (ops/pallas/reproject.py + ops/pallas/atrous.py) this
removes per frame: one kernel launch, the 6-plane f32 + 1-plane i32
accumulation write, the 4-plane dyn re-pack and re-read for level 1, and
the XLA glue between them.  The cost is recomputing the reprojection on the
level-1 halo rows (STRIP+16 instead of STRIP per strip, +25% reproj
arithmetic) — bandwidth and launch overhead dominate that on v5e.

Tap math is copied term-for-term from the two parity-tested kernels; the
composition is parity-tested against back_projection_stencil +
atrous_level (the XLA oracles) in tests/test_denoise.py.

Gating (caller: denoise/svgf.py): near-identity motion (same gate as
back_projection_stencil_pallas), atrous_nlevel >= 2 (level 1 is never the
last level, so no albedo remodulation here), history_level == 1 (the
filtered color IS the new color history), no debug views.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIP = 64
A = 8        # à-trous level-1 halo: taps reach 2*step=4 rows + 1 for the
             # variance Gaussian; rounded up to the 8-sublane tile
RH = 8       # reprojection halo on top of that: taps reach +-2 rows
EXT = STRIP + 2 * A          # rows the reprojection is computed on

# prev pack plane indices (same contract as ops/pallas/reproject.py)
_PR, _PG, _PB, _M1, _M2, _PH, _PNX, _PNY, _PNZ, _PGEOM = range(10)
# curr pack plane indices
_CR, _CG, _CB, _PX, _PY, _PZ, _NX, _NY, _NZ, _GEOM = range(10)

# 5x5 B3-spline kernel + 3x3 Gaussian (denoise.cu:82-86, 94-96)
_H5 = np.asarray([1/256, 1/64, 3/128, 1/64, 1/256,
                  1/64, 1/16, 3/32, 1/16, 1/64,
                  3/128, 3/32, 9/64, 3/32, 3/128,
                  1/64, 1/16, 3/32, 1/16, 1/64,
                  1/256, 1/64, 3/128, 1/64, 1/256], np.float64)
_G3 = np.asarray([1/16, 1/8, 1/16, 1/8, 1/4, 1/8, 1/16, 1/8, 1/16],
                 np.float64)


def _roll_cols(img, dx: int):
    if dx == 0:
        return img
    return pltpu.roll(img, shift=(-dx) % img.shape[-1], axis=1)


def _kernel(prev_hbm, curr_hbm, view_ref, scal_ref, out_f, out_h,
            pbuf, cbuf, rbuf, sems, *, h: int, w: int, wp: int,
            blur_variance: bool):
    i = pl.program_id(0)

    cp_p = pltpu.make_async_copy(
        prev_hbm.at[:, pl.ds(i * STRIP, EXT + 2 * RH), :], pbuf, sems.at[0])
    cp_c = pltpu.make_async_copy(
        curr_hbm.at[:, pl.ds(i * STRIP, EXT), :], cbuf, sems.at[1])
    cp_p.start()
    cp_c.start()
    cp_p.wait()
    cp_c.wait()

    # ---------------- reprojection on EXT rows -----------------------
    # (term-for-term the _kernel of ops/pallas/reproject.py; see
    # reference src/denoise.cu:185-317)
    def curr(p):
        return cbuf[p]

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

    iy = jax.lax.broadcasted_iota(jnp.int32, (EXT, wp), 0) + i * STRIP - A
    ix = jax.lax.broadcasted_iota(jnp.int32, (EXT, wp), 1)
    ey = jnp.clip(fy - iy, -1, 1)
    ex = jnp.clip(fx - ix, -1, 1)
    masks = {(a, b): ((ey == a) & (ex == b)).astype(jnp.float32)
             for a in (-1, 0, 1) for b in (-1, 0, 1)}

    def prev(p, oy: int, ox: int):
        sl = pbuf[p, RH + oy: RH + oy + EXT, :]
        return _roll_cols(sl, ox)

    cn = (curr(_NX), curr(_NY), curr(_NZ))
    geo_f = curr(_GEOM)

    taps = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            vals = []
            for p in range(10):
                acc = jnp.zeros((EXT, wp), jnp.float32)
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

    quad = [((0, 0), (1.0 - fracx) * (1.0 - fracy)),
            ((1, 0), fracx * (1.0 - fracy)),
            ((0, 1), (1.0 - fracx) * fracy),
            ((1, 1), fracx * fracy)]
    all_valid = base_valid
    for (dx, dy), _ in quad:
        all_valid = all_valid & taps[(dy, dx)][1]

    zero = jnp.zeros((EXT, wp), jnp.float32)
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

    n_hist = pbuf[_PH, RH: RH + EXT, :]
    valid = ((bilinear_ok | fallback_ok) & (n_hist > 0.0)
             & (geo_f != -1.0))

    cr, cg, cb = curr(_CR), curr(_CG), curr(_CB)
    lum = 0.2126 * cr + 0.7152 * cg + 0.0722 * cb
    color_alpha = jnp.maximum(1.0 / (n_hist + 1.0), scal_ref[0, 0])
    moment_alpha = jnp.maximum(1.0 / (n_hist + 1.0), scal_ref[0, 1])
    acc_r = cr * color_alpha + pc[0] * (1.0 - color_alpha)
    acc_g = cg * color_alpha + pc[1] * (1.0 - color_alpha)
    acc_b = cb * color_alpha + pc[2] * (1.0 - color_alpha)
    m1 = moment_alpha * pm[0] + (1.0 - moment_alpha) * lum
    m2 = moment_alpha * pm[1] + (1.0 - moment_alpha) * lum * lum
    var = jnp.maximum(m2 - m1 * m1, 0.0)

    # accumulation results: variance + color on all EXT rows into scratch
    # (consumed by the level-1 taps below); moments + history only on the
    # central STRIP rows, straight to the outputs
    rbuf[0] = jnp.where(valid, var, 100.0)
    rbuf[1] = jnp.where(valid, acc_r, cr)
    rbuf[2] = jnp.where(valid, acc_g, cg)
    rbuf[3] = jnp.where(valid, acc_b, cb)
    c0 = A
    c1 = A + STRIP
    out_f[4] = jnp.where(valid, m1, lum)[c0:c1]
    out_f[5] = jnp.where(valid, m2, lum * lum)[c0:c1]
    out_h[:] = jnp.where(valid, ph.astype(jnp.int32) + 1, 1)[c0:c1]

    # ---------------- à-trous level 1 (step = 2) ----------------------
    # (term-for-term the _kernel of ops/pallas/atrous.py at level=1,
    # is_last=False; dyn planes = the scratch accumulation above, static
    # position/normal planes = the curr pack already in VMEM)
    step = 2

    def dyn(p, dy=0, dx=0):
        sl = rbuf[p, A + dy: A + dy + STRIP, :]
        return _roll_cols(sl, dx)

    def stat(p, dy=0, dx=0):
        sl = cbuf[p, A + dy: A + dy + STRIP, :]
        return _roll_cols(sl, dx)

    ys = jax.lax.broadcasted_iota(jnp.int32, (STRIP, wp), 0) + i * STRIP
    xs = jax.lax.broadcasted_iota(jnp.int32, (STRIP, wp), 1)

    def inb(dy: int, dx: int):
        return (((ys + dy) >= 0) & ((ys + dy) < h)
                & ((xs + dx) >= 0) & ((xs + dx) < w)).astype(jnp.float32)

    if blur_variance:
        vsum = jnp.zeros((STRIP, wp), jnp.float32)
        wsum = jnp.zeros((STRIP, wp), jnp.float32)
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                g = float(_G3[k]); k += 1
                m = inb(dy, dx)
                vsum += g * dyn(0, dy, dx) * m
                wsum += g * m
        var_p = jnp.maximum(vsum / wsum, 0.0)
    else:
        var_p = jnp.maximum(dyn(0), 0.0)

    sigma_l = scal_ref[0, 2]
    sigma_n = scal_ref[0, 3]
    sigma_x = scal_ref[0, 4]
    denom_l = 1.0 / (jnp.sqrt(var_p) * sigma_l + 1e-6)
    inv_sn = 1.0 / (sigma_n + 1e-6)
    inv_sx = 1.0 / (sigma_x + 1e-6)

    fcr, fcg, fcb = dyn(1), dyn(2), dyn(3)
    lp = 0.2126 * fcr + 0.7152 * fcg + 0.0722 * fcb
    spx, spy, spz = stat(_PX), stat(_PY), stat(_PZ)
    snx, sny, snz = stat(_NX), stat(_NY), stat(_NZ)

    csum_r = jnp.zeros((STRIP, wp), jnp.float32)
    csum_g = jnp.zeros((STRIP, wp), jnp.float32)
    csum_b = jnp.zeros((STRIP, wp), jnp.float32)
    vsum2 = jnp.zeros((STRIP, wp), jnp.float32)
    wsum2 = jnp.zeros((STRIP, wp), jnp.float32)
    w2sum = jnp.zeros((STRIP, wp), jnp.float32)

    k = 0
    for j in (-2, -1, 0, 1, 2):          # k = (2+i) + (2+j)*5 order
        for ii in (-2, -1, 0, 1, 2):     # (denoise.cu:130-148)
            hk = float(_H5[k]); k += 1
            dy, dx = j * step, ii * step
            qr, qg, qb = dyn(1, dy, dx), dyn(2, dy, dx), dyn(3, dy, dx)
            if dy == 0 and dx == 0:
                wgt = hk * inb(0, 0)
            else:
                lq = 0.2126 * qr + 0.7152 * qg + 0.0722 * qb
                dxp = spx - stat(_PX, dy, dx)
                dyp = spy - stat(_PY, dy, dx)
                dzp = spz - stat(_PZ, dy, dx)
                dist_x = jnp.sqrt(dxp * dxp + dyp * dyp + dzp * dzp)
                dxn = snx - stat(_NX, dy, dx)
                dyn_ = sny - stat(_NY, dy, dx)
                dzn = snz - stat(_NZ, dy, dx)
                dist_n = jnp.sqrt(dxn * dxn + dyn_ * dyn_ + dzn * dzn)
                wgt = hk * jnp.exp(-(jnp.abs(lp - lq) * denom_l
                                     + dist_n * inv_sn
                                     + dist_x * inv_sx)) * inb(dy, dx)
            wsum2 += wgt
            w2sum += wgt * wgt
            csum_r += qr * wgt
            csum_g += qg * wgt
            csum_b += qb * wgt
            vsum2 += dyn(0, dy, dx) * wgt * wgt

    ok = wsum2 > 1e-5                              # 10e-6 (denoise.cu:159)
    inv_w = 1.0 / jnp.where(ok, wsum2, 1.0)
    out_f[0] = jnp.where(ok, csum_r * inv_w, fcr)
    out_f[1] = jnp.where(ok, csum_g * inv_w, fcg)
    out_f[2] = jnp.where(ok, csum_b * inv_w, fcb)
    out_f[3] = jnp.where(ok, vsum2 / jnp.where(w2sum > 0, w2sum, 1.0),
                         dyn(0))


def back_projection_atrous1_pallas(res, current_color, curr_gb, prev_gb,
                                   prev_viewmat, color_history,
                                   moment_history, history_length,
                                   color_alpha_min, moment_alpha_min,
                                   sigma_l, sigma_n, sigma_x,
                                   blur_variance: bool,
                                   interpret: bool = False):
    """Fused BackProjection + à-trous level 1. Caller must gate on
    near-identity motion (same gate as back_projection_stencil) and on
    atrous_nlevel >= 2 / history_level == 1 (see module docstring).
    Returns (color_l1 (H,W,3), var_l1 (H,W), moment_acc (H,W,2),
    history_update (H,W) int32) — color_l1 is both the level-2 input and
    the new color history."""
    w, h = res
    wp = -(-w // 128) * 128
    hp = -(-h // STRIP) * STRIP
    pad = A + RH

    prev = jnp.stack([
        color_history[..., 0], color_history[..., 1], color_history[..., 2],
        moment_history[..., 0], moment_history[..., 1],
        history_length.astype(jnp.float32),
        prev_gb["normal"][..., 0], prev_gb["normal"][..., 1],
        prev_gb["normal"][..., 2],
        prev_gb["geom_id"].astype(jnp.float32),
    ])
    prev = jnp.pad(prev, ((0, 0), (pad, pad + hp - h), (0, wp - w)))
    # padding contract: out-of-image geom id = -1 (rows; wrapped columns
    # and beyond-w lanes are rejected by the in-bounds tap test)
    prev = prev.at[_PGEOM, :pad, :].set(-1.0)
    prev = prev.at[_PGEOM, pad + h:, :].set(-1.0)

    curr = jnp.stack([
        current_color[..., 0], current_color[..., 1], current_color[..., 2],
        curr_gb["position"][..., 0], curr_gb["position"][..., 1],
        curr_gb["position"][..., 2],
        curr_gb["normal"][..., 0], curr_gb["normal"][..., 1],
        curr_gb["normal"][..., 2],
        curr_gb["geom_id"].astype(jnp.float32),
    ])
    curr = jnp.pad(curr, ((0, 0), (A, A + hp - h), (0, wp - w)))
    # halo rows reproject too (their results feed level-1 taps); mark
    # them background so they resolve to their (zero) raw color
    curr = curr.at[_GEOM, :A, :].set(-1.0)
    curr = curr.at[_GEOM, A + h:, :].set(-1.0)

    view = prev_viewmat[:3, :].astype(jnp.float32)          # (3, 4) SMEM
    scal = jnp.stack([jnp.float32(color_alpha_min),
                      jnp.float32(moment_alpha_min),
                      jnp.float32(sigma_l), jnp.float32(sigma_n),
                      jnp.float32(sigma_x)]).reshape(1, 5)

    kern = functools.partial(_kernel, h=h, w=w, wp=wp,
                             blur_variance=bool(blur_variance))
    out_f, out_h = pl.pallas_call(
        kern,
        grid=(hp // STRIP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # prev pack
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # curr pack
            pl.BlockSpec((3, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 5), lambda i: (0, 0),
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
            pltpu.VMEM((10, EXT + 2 * RH, wp), jnp.float32),
            pltpu.VMEM((10, EXT, wp), jnp.float32),
            pltpu.VMEM((4, EXT, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prev, curr, view, scal)

    color_l1 = jnp.moveaxis(out_f[0:3, :h, :w], 0, -1)
    var_l1 = out_f[3, :h, :w]
    moment_acc = jnp.moveaxis(out_f[4:6, :h, :w], 0, -1)
    history_update = out_h[:h, :w]
    return color_l1, var_l1, moment_acc, history_update
