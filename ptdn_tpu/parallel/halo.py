"""Explicit row-halo exchange for shard_map'd stencil kernels.

The à-trous level-L 5x5 dilated stencil reads 2*2^L rows past each slab
edge (reference src/denoise.cu:130-148: taps at j*step, step = 1<<level)
— at level 5 that is 64 rows (72 after the 8-sublane rounding of
ops/pallas/atrous._halo), which can EXCEED the shard height (e.g. a
64-row image over 8 chips is 8 rows/shard). `halo_rows` therefore
chains `lax.ppermute` hops to as many neighbors as the halo spans;
each hop is one ICI collective-permute. Rows past the global image
edges come back zero-filled, which is safe: the kernels mask every tap
by its GLOBAL image coordinate (inb(), ops/pallas/atrous.py), so
out-of-image data never contributes weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_rows(x, halo: int, axis_name: str):
    """Return (top, bottom): `halo` rows of `x` (a per-shard slab,
    rows = axis 0) fetched from the neighboring shards above/below
    along `axis_name`. Must be called inside shard_map. Rows beyond
    the first/last shard are zeros (masked by the kernels' global
    coordinate checks)."""
    n = jax.lax.axis_size(axis_name)
    h_loc = x.shape[0]
    hops = -(-halo // h_loc)
    above = []   # above[k-1] = this shard's view of shard i-k's slab
    below = []   # below[k-1] = shard i+k's slab
    for k in range(1, hops + 1):
        # send to the shard k below you => each shard receives from i-k
        above.append(jax.lax.ppermute(
            x, axis_name, [(i, i + k) for i in range(n - k)]))
        below.append(jax.lax.ppermute(
            x, axis_name, [(i + k, i) for i in range(n - k)]))
    # global row order above this shard is [i-hops ... i-1]
    top = jnp.concatenate(above[::-1], axis=0)[-halo:] if above else \
        jnp.zeros((halo,) + x.shape[1:], x.dtype)
    bottom = jnp.concatenate(below, axis=0)[:halo] if below else \
        jnp.zeros((halo,) + x.shape[1:], x.dtype)
    return top, bottom
