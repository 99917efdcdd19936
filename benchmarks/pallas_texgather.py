"""Pallas TPU kernel: arbitrary-index table gather at VPU rate.

XLA's TPU gather runs a scalar per-index loop (~140 M idx/s measured on
v5e — benchmarks/micro_gather.py), which makes the per-bounce texture
fetch the single most expensive stage of the cornell frame (~4 ms per
640K-lane site; reference semantics: Texture::getColor,
reference src/sceneStructs.h:208-221).

This kernel exploits Mosaic's vreg-local dynamic gathers
(tpu.dynamic_gather): take_along_axis along sublanes works for exactly
8 rows x any width, and along lanes for any depth x exactly 128 lanes
(capability map: benchmarks/micro_dyngather.py). An arbitrary gather
from a table of T entries is composed by viewing the table as
[G, 8, 128] row-groups and, per 1024-index tile, scanning the group
range [gmin, gmax] actually referenced by the tile:

    acc = select(g == g', lane_gather(sublane_gather(V_g', a), l), acc)

Coherent tiles (primary rays) touch 1-2 groups; fully incoherent tiles
touch up to G. At G=123 (cornell's 500x250 texture) the worst case is
~600 vreg ops per tile — ~10x faster than the scalar-loop gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RROWS = 8
TILE = RROWS * 128

# VMEM budget gate: the table must stay resident across grid steps.
# 256 groups = 1 MB (u32). Larger tables (room's 2x 1024^2 atlas) keep
# the XLA gather path.
MAX_GROUPS = 256


def gather_table_groups(table_ref, idx, shape, valid=None):
    """In-kernel body: gather table_ref[(G,8,128) i32] at flat indices
    idx [S,128] -> [S,128] i32. Shared with fused kernels.

    Two chained vreg gathers cannot express an arbitrary 2D gather (the
    first stage collides when two lanes of a sublane need the same
    column of different rows), so the sublane axis is handled with a
    collision-free 8-way select: per group, each of the 8 sublane rows
    is broadcast and lane-gathered, then selected where (g, a) match.

    `valid` (bool, optional) masks lanes that don't need a texel; they
    are excluded from the [gmin, gmax] scan range so a tile with few
    textured lanes only visits the groups those lanes touch."""
    g = jax.lax.shift_right_logical(idx, 10)
    a = jax.lax.shift_right_logical(idx, 7) & 7
    l = idx & 127
    if valid is None:
        gmin = jnp.min(g)
        gmax = jnp.max(g)
    else:
        big = jnp.int32(2 ** 30)
        gmin = jnp.min(jnp.where(valid, g, big))
        gmax = jnp.max(jnp.where(valid, g, -1))
    acc = jnp.zeros(shape, jnp.int32)

    def body(gp, acc):
        hit_g = g == gp
        for ap in range(8):
            row = table_ref[gp, ap]            # [1?, 128] sublane row
            row8 = jnp.broadcast_to(row.reshape(1, 128), shape)
            s2 = jnp.take_along_axis(row8, l, axis=1)
            acc = jnp.where(hit_g & (a == ap), s2, acc)
        return acc

    return jax.lax.fori_loop(gmin, gmax + 1, body, acc)


def _kernel(idx_ref, table_ref, out_ref):
    out_ref[:] = gather_table_groups(table_ref, idx_ref[:], (RROWS, 128))


def gather_u32_pallas(table_u32, idx, *, interpret=False):
    """table_u32: flat (T,) u32. idx: (N,) i32 with N % 1024 == 0 and
    values in [0, T). Returns (N,) u32, equal to table_u32[idx]."""
    n = idx.shape[0]
    assert n % TILE == 0, n
    t = table_u32.shape[0]
    groups = -(-t // (8 * 128))
    pad = groups * 8 * 128 - t
    table = jnp.pad(table_u32, (0, pad)).reshape(groups, 8, 128)
    out = pl.pallas_call(
        _kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((RROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        interpret=interpret,
    )(idx.reshape(n // 128, 128),
      jax.lax.bitcast_convert_type(table, jnp.int32))
    return jax.lax.bitcast_convert_type(out.reshape(n), jnp.uint32)


def table_groups(t: int) -> int:
    """Number of (8,128) row-groups for a flat table of t entries."""
    return -(-t // (8 * 128))
