"""In-row (128-lane) plane permutation — the cheap half of the
fresh-group permute.

The per-bounce global row gather is a hard ~1 row/clock wall at
per-lane granularity, but G-lane grouped rows gather ~G-fold faster
(benchmarks/micro_permute.py). Round 4 showed groups INHERITED from the
previous bounce's sort decorrelate and destroy trace-tile coherence
(docs/PERF_NOTES.md, sort_group). This kernel enables FRESH groups each
bounce: after a per-row argsort of the coherence key (XLA sort_key_val
over the lane axis), applying that order to every carried plane is a
vreg-local `tpu.dynamic_gather` along lanes — take_along_axis(axis=1)
with exactly 128 lanes — which is measured FREE at wavefront scale
(benchmarks/micro_regroup.py: ~0.0 ms for 29 planes x 640k lanes vs
220 ms for the same gather in XLA). G adjacent lanes are then
key-coherent by construction and the global sort/gather runs at group
granularity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

RROWS = 8


def _kernel(o_ref, p_ref, out_ref, *, k_pl: int):
    o = o_ref[0]                               # [RROWS, 128] i32
    for k in range(k_pl):
        out_ref[k] = jnp.take_along_axis(p_ref[k], o, axis=1)


def inrow_permute_pallas(planes, order, interpret: bool = False):
    """planes: [K, nb, 128] f32; order: [nb, 128] i32 lane indices
    (order[r, j] = source lane of output lane j in row r). Returns the
    permuted planes. Pure data movement — every row's 128 lanes are
    shuffled within the row."""
    k_pl, nb, _ = planes.shape
    assert nb % RROWS == 0, nb
    return pl.pallas_call(
        lambda o_ref, p_ref, out_ref: _kernel(o_ref, p_ref, out_ref,
                                              k_pl=k_pl),
        grid=(nb // RROWS,),
        in_specs=[pl.BlockSpec((1, RROWS, 128), lambda i: (0, i, 0)),
                  pl.BlockSpec((k_pl, RROWS, 128), lambda i: (0, i, 0))],
        out_specs=pl.BlockSpec((k_pl, RROWS, 128), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((k_pl, nb, 128), planes.dtype),
        interpret=interpret,
    )(order[None], planes)
