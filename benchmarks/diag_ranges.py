"""Diagnostic: per-tile crossed-chunk union widths after the coherence
sort — the trip counts of the trace kernel's range-bounded loops.

Prints, for a depth-3 bunny state: histogram of per-tile union widths
for next rays and shadow rays, plus admitted-chunk estimates (how many
chunks in the union actually pass the per-lane window cull for some
lane, using the unbounded-window crossed masks as proxy).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from profile_mesh import (advance, build_state, ds, n, n_chunks,
                          nb, permute_fn, shade_fn)
from ptdn_tpu.engine import wavefront as WF
from ptdn_tpu.ops.pallas import shade as SH

planes, pix = build_state(jnp.uint32(0))
for d in (1, 2):
    planes, pix = advance(planes, pix, d)
outA = jax.jit(shade_fn)(planes, pix, 3)
outAp, pixp = jax.jit(permute_fn)(outA, pix)

NO = SH.N_OUT
nlo = np.asarray(outAp[NO]).astype(np.int32)
nhi = np.asarray(outAp[NO + 1]).astype(np.int32)
slo = np.asarray(outAp[NO + 2]).astype(np.int32)
shi = np.asarray(outAp[NO + 3]).astype(np.int32)
act = np.asarray(outAp[SH.O_ACT]) > 0.5

ntile = nb // 8


def tile_stats(lo, hi, tag):
    lo_t = lo.reshape(ntile, 8 * 128).min(axis=1)
    hi_t = hi.reshape(ntile, 8 * 128).max(axis=1)
    width = np.maximum(hi_t - lo_t + 1, 0)
    live = width > 0
    print(f"{tag}: tiles with mesh work {live.sum()}/{ntile}, "
          f"union width mean {width[live].mean():.1f} "
          f"p50 {np.percentile(width[live], 50):.0f} "
          f"p90 {np.percentile(width[live], 90):.0f} "
          f"max {width.max()}, total trips {width.sum()}")
    return width


print(f"active lanes: {act.mean() * 100:.1f}%")
wn = tile_stats(nlo, nhi, "next rays  ")
ws = tile_stats(slo, shi, "shadow rays")

# per-lane crossed-count (how many chunks a lane's ray crosses at all)
# vs the width of its [lo, hi] range — how much of the range is holes
for tag, lo, hi in (("next", nlo, nhi), ("shadow", slo, shi)):
    w_lane = np.maximum(hi - lo + 1, 0)
    liv = w_lane.reshape(-1) > 0
    print(f"{tag} per-LANE range width: mean {w_lane.reshape(-1)[liv].mean():.2f} "
          f"p90 {np.percentile(w_lane.reshape(-1)[liv], 90):.0f} "
          f"max {w_lane.max()}")

# exact crossed masks in numpy: per-lane crossed count and per-tile
# union POPCOUNT (the trip count a bitmask-driven chunk loop would pay)
cmin = np.asarray(ds.tri_chunk_min)[:n_chunks]
cmax = np.asarray(ds.tri_chunk_max)[:n_chunks]


def crossed_mask(o, d):
    inv = 1.0 / d
    t0 = (cmin[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (cmax[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tmin = np.minimum(t0, t1).max(axis=2)
    tmax = np.maximum(t0, t1).min(axis=2)
    return (tmax >= 0.0) & (tmin <= tmax)


def mask_stats(o, d, lane_valid, tag):
    m = crossed_mask(o, d) & lane_valid[:, None]
    cnt = m.sum(axis=1)
    liv = cnt > 0
    um = m.reshape(ntile, 8 * 128, n_chunks).any(axis=1)
    pop = um.sum(axis=1)
    plive = pop > 0
    print(f"{tag}: per-lane crossed mean {cnt[liv].mean():.2f} "
          f"p90 {np.percentile(cnt[liv], 90):.0f}; tile-union popcount "
          f"mean {pop[plive].mean():.1f} p90 {np.percentile(pop[plive], 90):.0f} "
          f"total {pop.sum()} (vs range trips above)")


o_n = np.stack([np.asarray(outAp[SH.O_SPX]).reshape(-1),
                np.asarray(outAp[SH.O_SPY]).reshape(-1),
                np.asarray(outAp[SH.O_SPZ]).reshape(-1)], axis=1)
d_n = np.stack([np.asarray(outAp[SH.O_DX]).reshape(-1),
                np.asarray(outAp[SH.O_DY]).reshape(-1),
                np.asarray(outAp[SH.O_DZ]).reshape(-1)], axis=1)
d_s = np.stack([np.asarray(outAp[SH.O_SDX]).reshape(-1),
                np.asarray(outAp[SH.O_SDY]).reshape(-1),
                np.asarray(outAp[SH.O_SDZ]).reshape(-1)], axis=1)
nee = np.asarray(outAp[SH.O_NEE]).reshape(-1) > 0.5
mask_stats(o_n, d_n, act.reshape(-1), "next  masks")
mask_stats(o_n, d_s, act.reshape(-1) & nee, "shadow masks")
