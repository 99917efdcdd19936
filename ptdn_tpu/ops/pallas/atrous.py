"""Pallas TPU kernel: fused edge-stopping à-trous level.

One launch = one full ATrousFilter level (reference src/denoise.cu:77-170):
the 3x3 Gaussian variance pre-blur, all 25 dilated taps with
luminance/normal/position edge-stopping weights, color/variance
normalization, and (last level) albedo remodulation — fused over a
row-strip grid so every input tile is read from HBM exactly once into
VMEM, instead of XLA materializing 25 shifted image copies.

Layout: images are split into single-channel (H, W) planes, W padded to a
lane multiple and H padded by the halo. The G-buffer planes (position,
normal, albedo*ialbedo) are packed ONCE per frame (`pack_static_planes`)
and reused by all 5 levels; only color+variance are repacked per level.
Strips overlap by the halo (2*step + 1 rows), which non-overlapping
BlockSpecs can't express, so inputs stay in HBM (`pl.ANY`) and the kernel
DMAs each strip+halo into VMEM scratch — the standard overlapping-stencil
pattern.

Semantics note (same as the XLA path): the reference updates its variance
buffer in place while neighbors read it (a data race, denoise.cu:153-161);
we implement the intended read-old/write-new semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STRIP = 64   # baseline output rows per grid step (see _pick_strip)


def _halo(level: int) -> int:
    """Row halo for a level: 2*step for the taps + 1 for the Gaussian,
    rounded up to the 8-sublane tiling Mosaic requires of slice shapes."""
    return -(-(2 * (1 << level) + 1) // 8) * 8


# VMEM budget for the strip scratch buffers (the kernel runs with a
# 100 MB vmem_limit; leave room for outputs + compiler temporaries)
_VMEM_SCRATCH_CAP = 56 * 1024 * 1024

# Hard cap on output rows per strip: the kernel body keeps ~100
# (strip, wp)-sized f32 temporaries live across the 25-tap loop, which
# the register allocator spills to VMEM at ~0.36 MB per strip row
# (measured: strip=800 on an 800x896 image compiled to 289 MB of spill
# slots and OOMed the 128 MB VMEM at compile). The DMA-overlap saving
# this sizing chases is already mostly banked by 128 rows (level-5
# halo 72: 2.25x payload at STRIP=64 -> 1.13x at 128).
_MAX_STRIP = 128


def _pick_strip(h: int, wp: int, halo: int, n_planes: int) -> int:
    """Output rows per grid step for this (image, level): each strip
    re-DMAs its 2*halo overlap, so taller strips cut total HBM traffic
    (level 5's halo is 72 rows — at STRIP=64 that is 3.25x the payload),
    bounded by the VMEM scratch budget, the register-spill cap
    (_MAX_STRIP), and the padding waste of the last strip. Minimizes
    DMA'd rows + padded compute rows."""
    per_row = n_planes * wp * 4
    best_s, best_cost = STRIP, None
    s = STRIP
    while s <= min(_MAX_STRIP, -(-h // 8) * 8):
        if (s + 2 * halo) * per_row <= _VMEM_SCRATCH_CAP:
            nstrips = -(-h // s)
            cost = nstrips * (s + 2 * halo) + (nstrips * s - h)
            if best_cost is None or cost < best_cost:
                best_s, best_cost = s, cost
        s += 8
    return best_s

# 5x5 B3-spline kernel weights (denoise.cu:82-86)
_H5 = np.asarray([1/256, 1/64, 3/128, 1/64, 1/256,
                  1/64, 1/16, 3/32, 1/16, 1/64,
                  3/128, 3/32, 9/64, 3/32, 3/128,
                  1/64, 1/16, 3/32, 1/16, 1/64,
                  1/256, 1/64, 3/128, 1/64, 1/256], np.float64)
_G3 = np.asarray([1/16, 1/8, 1/16, 1/8, 1/4, 1/8, 1/16, 1/8, 1/16],
                 np.float64)

# plane indices: dynamic pack (per level) and static pack (per frame)
_CR, _CG, _CB, _VAR = range(4)
_PX, _PY, _PZ, _NX, _NY, _NZ, _AR, _AG, _AB = range(9)


def _col_shift(img, dx: int):
    """out[:, x] = img[:, x+dx], CIRCULAR (tpu.roll — Mosaic can't concat
    at unaligned lane offsets). Wrapped columns land exactly where the
    caller's in-bounds masks zero the tap weight, so they never leak."""
    if dx == 0:
        return img
    wp = img.shape[1]
    return pltpu.roll(img, shift=(-dx) % wp, axis=1)


def _kernel(dyn_hbm, stat_hbm, sig_ref, out_c, out_v, dbuf, sbuf, sems,
            *, level: int, h: int, w: int, wp: int, is_last: bool,
            blur_variance: bool, add_color: bool, strip: int = STRIP):
    """h = FULL image height for the validity masks; sig_ref[0,3] is
    row0, the global image row of this launch's output row 0 (0 on a
    single chip; the shard's row offset under shard_map — rides the
    existing sigma SMEM operand so sharding adds no per-block operand
    cost, docs/PERF_NOTES.md supergroup lesson)."""
    step = 1 << level
    halo = _halo(level)
    rows = strip + 2 * halo
    i = pl.program_id(0)

    cp_d = pltpu.make_async_copy(
        dyn_hbm.at[:, pl.ds(i * strip, rows), :], dbuf, sems.at[0])
    cp_s = pltpu.make_async_copy(
        stat_hbm.at[:, pl.ds(i * strip, rows), :], sbuf, sems.at[1])
    cp_d.start()
    cp_s.start()
    cp_d.wait()
    cp_s.wait()

    def dyn(p, dy=0, dx=0):
        sl = dbuf[p, halo + dy: halo + dy + strip, :]   # static ref slice
        return _col_shift(sl, dx)

    def stat(p, dy=0, dx=0):
        sl = sbuf[p, halo + dy: halo + dy + strip, :]
        return _col_shift(sl, dx)

    # global coords of this strip's output pixels (validity masks);
    # row0 (f32 scalar, exact for any realistic H) shifts local rows to
    # GLOBAL image rows so sharded slabs mask taps at true image edges
    row0 = sig_ref[0, 3].astype(jnp.int32)
    ys = (jax.lax.broadcasted_iota(jnp.int32, (strip, wp), 0)
          + i * strip + row0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (strip, wp), 1)

    def inb(dy: int, dx: int):
        return (((ys + dy) >= 0) & ((ys + dy) < h)
                & ((xs + dx) >= 0) & ((xs + dx) < w)).astype(jnp.float32)

    # ---- variance at p: optional border-renormalized 3x3 Gaussian ----
    if blur_variance:
        vsum = jnp.zeros((strip, wp), jnp.float32)
        wsum = jnp.zeros((strip, wp), jnp.float32)
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                g = float(_G3[k]); k += 1
                m = inb(dy, dx)
                vsum += g * dyn(_VAR, dy, dx) * m
                wsum += g * m
        var_p = jnp.maximum(vsum / wsum, 0.0)
    else:
        var_p = jnp.maximum(dyn(_VAR), 0.0)

    sigma_l = sig_ref[0, 0]
    sigma_n = sig_ref[0, 1]
    sigma_x = sig_ref[0, 2]
    denom_l = 1.0 / (jnp.sqrt(var_p) * sigma_l + 1e-6)
    inv_sn = 1.0 / (sigma_n + 1e-6)
    inv_sx = 1.0 / (sigma_x + 1e-6)

    cr, cg, cb = dyn(_CR), dyn(_CG), dyn(_CB)
    lp = 0.2126 * cr + 0.7152 * cg + 0.0722 * cb
    px, py, pz = stat(_PX), stat(_PY), stat(_PZ)
    nx, ny, nz = stat(_NX), stat(_NY), stat(_NZ)

    csum_r = jnp.zeros((strip, wp), jnp.float32)
    csum_g = jnp.zeros((strip, wp), jnp.float32)
    csum_b = jnp.zeros((strip, wp), jnp.float32)
    vsum2 = jnp.zeros((strip, wp), jnp.float32)
    wsum2 = jnp.zeros((strip, wp), jnp.float32)
    w2sum = jnp.zeros((strip, wp), jnp.float32)

    k = 0
    for j in (-2, -1, 0, 1, 2):          # k = (2+i) + (2+j)*5 order
        for ii in (-2, -1, 0, 1, 2):     # (denoise.cu:130-148)
            hk = float(_H5[k]); k += 1
            dy, dx = j * step, ii * step
            qr, qg, qb = dyn(_CR, dy, dx), dyn(_CG, dy, dx), dyn(_CB, dy, dx)
            if dy == 0 and dx == 0:
                # center tap: all three edge-stopping weights are
                # exactly exp(0) = 1
                wgt = hk * inb(0, 0)
            else:
                lq = 0.2126 * qr + 0.7152 * qg + 0.0722 * qb
                dxp = px - stat(_PX, dy, dx)
                dyp = py - stat(_PY, dy, dx)
                dzp = pz - stat(_PZ, dy, dx)
                dist_x = jnp.sqrt(dxp * dxp + dyp * dyp + dzp * dzp)
                dxn = nx - stat(_NX, dy, dx)
                dyn_ = ny - stat(_NY, dy, dx)
                dzn = nz - stat(_NZ, dy, dx)
                dist_n = jnp.sqrt(dxn * dxn + dyn_ * dyn_ + dzn * dzn)
                # wl*wn*wx with one transcendental: the reference's
                # min(1, exp(-x)) clamps (denoise.cu:139-140) are no-ops
                # for x >= 0 (always true: distances and |dl| are
                # non-negative, sigmas positive), so the three exps fuse
                # into exp of the negated sum — ~1 ulp reassociation,
                # covered by the 1e-5 oracle-parity tolerance
                wgt = hk * jnp.exp(-(jnp.abs(lp - lq) * denom_l
                                     + dist_n * inv_sn
                                     + dist_x * inv_sx)) * inb(dy, dx)
            wsum2 += wgt
            w2sum += wgt * wgt
            csum_r += qr * wgt
            csum_g += qg * wgt
            csum_b += qb * wgt
            vsum2 += dyn(_VAR, dy, dx) * wgt * wgt

    ok = wsum2 > 1e-5                              # 10e-6 (denoise.cu:159)
    inv_w = 1.0 / jnp.where(ok, wsum2, 1.0)
    out_r = jnp.where(ok, csum_r * inv_w, cr)
    out_g = jnp.where(ok, csum_g * inv_w, cg)
    out_b = jnp.where(ok, csum_b * inv_w, cb)
    new_var = jnp.where(ok, vsum2 / jnp.where(w2sum > 0, w2sum, 1.0),
                        dyn(_VAR))
    if is_last and add_color:
        out_r = out_r * stat(_AR)
        out_g = out_g * stat(_AG)
        out_b = out_b * stat(_AB)

    out_c[0] = out_r
    out_c[1] = out_g
    out_c[2] = out_b
    out_v[:] = new_var


def _pad_planes(planes, halo, hp, h, w, wp):
    return jnp.pad(planes, ((0, 0), (halo, halo + hp - h), (0, wp - w)))


def pack_static_planes(gbuffer, max_level: int, with_albedo: bool = True,
                       pre_extended: bool = False):
    """G-buffer planes packed once per frame, padded for the LARGEST halo
    and strip (all levels share them; smaller levels/strips just read a
    sub-window). with_albedo=False drops the 3 albedo*ialbedo planes —
    only the last level with add_color reads them, so every other config
    saves a third of the static DMA at each level.

    pre_extended=True (sharded slabs): the gbuffer arrays already carry
    exactly `atrous_halo(max_level)` REAL neighbor rows on both sides
    (parallel.halo.halo_rows) — they land where the zero pad would,
    so cross-shard taps read true G-buffer data."""
    h, w = gbuffer["position"].shape[:2]
    if pre_extended:
        h -= 2 * _halo(max_level)
    plist = [
        gbuffer["position"][..., 0], gbuffer["position"][..., 1],
        gbuffer["position"][..., 2],
        gbuffer["normal"][..., 0], gbuffer["normal"][..., 1],
        gbuffer["normal"][..., 2],
    ]
    if with_albedo:
        alb = gbuffer["albedo"] * gbuffer["ialbedo"]
        plist += [alb[..., 0], alb[..., 1], alb[..., 2]]
    planes = jnp.stack(plist)
    halo = _halo(max_level)
    wp = -(-w // 128) * 128
    n_stat = len(plist)
    hp = max(
        -(-h // s) * s
        for s in (_pick_strip(h, wp, _halo(lv), 4 + n_stat)
                  for lv in range(1, max(max_level, 1) + 1)))
    if pre_extended:
        return jnp.pad(planes, ((0, 0), (0, hp - h), (0, wp - w))), halo
    return _pad_planes(planes, halo, hp, h, w, wp), halo


# exported for sharded callers sizing their halo exchanges
atrous_halo = _halo


def atrous_level_pallas(color, variance, static_planes, static_halo: int,
                        gbuffer_shape, level: int, is_last: bool,
                        sigma_l, sigma_n, sigma_x, blur_variance: bool,
                        add_color: bool, interpret: bool = False,
                        row0=None, full_h: int = None,
                        halo_top=None, halo_bottom=None):
    """One fused à-trous level. static_planes from pack_static_planes.
    Returns (color_out (H,W,3), variance_out (H,W)).

    Sharded slabs (parallel/sharded.py): `color`/`variance` are the
    shard's LOCAL rows; `halo_top`/`halo_bottom` are (color, variance)
    tuples of exactly `atrous_halo(level)` real neighbor rows (from
    parallel.halo.halo_rows), `row0` the shard's global first row
    (traced scalar) and `full_h` the GLOBAL image height — taps then
    read real cross-shard data and mask at true image edges, exactly
    like the single-chip program."""
    h, w = gbuffer_shape
    halo = _halo(level)
    wp = -(-w // 128) * 128
    n_stat = int(static_planes.shape[0])
    if is_last and add_color and n_stat < 9:
        raise ValueError("add_color needs pack_static_planes(with_albedo"
                         "=True)")
    strip = _pick_strip(h, wp, halo, 4 + n_stat)
    hp = -(-h // strip) * strip

    dyn = jnp.stack([color[..., 0], color[..., 1], color[..., 2], variance])
    if halo_top is not None:
        ct, vt = halo_top
        cb, vb = halo_bottom
        tt = jnp.stack([ct[..., 0], ct[..., 1], ct[..., 2], vt])
        bb = jnp.stack([cb[..., 0], cb[..., 1], cb[..., 2], vb])
        if tt.shape[1] != halo or bb.shape[1] != halo:
            raise ValueError(f"halo rows must be atrous_halo({level})="
                             f"{halo}, got {tt.shape[1]}/{bb.shape[1]}")
        dyn = jnp.concatenate([tt, dyn, bb], axis=1)
        dyn = jnp.pad(dyn, ((0, 0), (0, hp - h), (0, wp - w)))
    else:
        dyn = _pad_planes(dyn, halo, hp, h, w, wp)
    # static planes are padded with static_halo rows; this level needs
    # halo rows: offset so that scratch row r == global row r - halo
    stat = jax.lax.slice_in_dim(static_planes, static_halo - halo,
                                static_halo - halo + hp + 2 * halo, axis=1)

    sig = jnp.stack([jnp.float32(sigma_l), jnp.float32(sigma_n),
                     jnp.float32(sigma_x),
                     jnp.float32(0.0 if row0 is None else row0)]
                    ).reshape(1, 4)

    rows = strip + 2 * halo
    kern = functools.partial(_kernel, level=level,
                             h=(h if full_h is None else full_h), w=w, wp=wp,
                             is_last=is_last, blur_variance=blur_variance,
                             add_color=add_color, strip=strip)
    out_c, out_v = pl.pallas_call(
        kern,
        grid=(hp // strip,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # dyn (HBM)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # static
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),       # sigmas
        ],
        out_specs=[
            pl.BlockSpec((3, strip, wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((strip, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, rows, wp), jnp.float32),
            pltpu.VMEM((n_stat, rows, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dyn, stat, sig)

    color_out = jnp.moveaxis(out_c[:, :h, :w], 0, -1)
    return color_out, out_v[:h, :w]
