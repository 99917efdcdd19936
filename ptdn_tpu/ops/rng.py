"""Counter-based RNG: TEA seed hash + LCG stream, bit-exact vs reference.

The reference seeds per (pixel, frame+depth) with a 16-round TEA-style
hash and draws from a Numerical-Recipes LCG (reference
src/interactions.h:10-30). Both are pure uint32 arithmetic — stateless
across kernels and trivially vectorizable, a perfect fit for JAX: a
"random stream" is just a uint32 array of per-lane seeds threaded through
the bounce loop.

Because different lanes consume different NUMBERS of variates (diffuse
lanes draw more than specular ones), every draw site uses
`next_rand_masked`: lanes advance their LCG state only where that draw
would happen in the reference's per-thread control flow. This reproduces
the reference's exact variate sequence lane-by-lane.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def init_rand(val0, val1, backoff: int = 16):
    """TEA-style hash (interactions.h:10-22). val0/val1: uint32 arrays."""
    v0 = jnp.asarray(val0).astype(U32)
    v1 = jnp.asarray(val1).astype(U32)
    s0 = U32(0)
    for _ in range(backoff):
        s0 = s0 + U32(0x9E3779B9)
        v0 = v0 + ((((v1 << 4) + U32(0xA341316C)) ^ (v1 + s0))
                   ^ ((v1 >> 5) + U32(0xC8013EA4)))
        v1 = v1 + ((((v0 << 4) + U32(0xAD90777D)) ^ (v0 + s0))
                   ^ ((v0 >> 5) + U32(0x7E95761E)))
    return v0


def next_rand(seed):
    """One LCG step (interactions.h:25-30): returns (new_seed, u01)."""
    seed = (U32(1664525) * seed + U32(1013904223)).astype(U32)
    val = (seed & U32(0x00FFFFFF)).astype(jnp.float32) / jnp.float32(0x01000000)
    return seed, val


def next_rand_masked(seed, mask):
    """LCG step only where `mask`; elsewhere the seed (and stream position)
    is unchanged. Returns (new_seed, u01) — u01 is garbage off-mask."""
    new_seed, val = next_rand(seed)
    return jnp.where(mask, new_seed, seed), val
