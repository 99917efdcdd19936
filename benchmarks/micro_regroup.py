"""Micro-bench: FRESH-GROUP permute = in-row (128-lane) key sort +
G-lane grouped global gather.

micro_permute.py round-5 finding: the global row gather is a hard
~1 row/clock wall at G=1 (6.4 ms @ 640k), but G=4 grouped rows gather
in 2.68 ms — and round 4 showed CHAINED groups (adjacency inherited
from the previous bounce's sort) destroy trace coherence. This
measures the missing piece: regrouping each bounce with a per-row
lane sort so the G adjacent lanes are key-coherent BY CONSTRUCTION,
priced as (a) XLA variadic row sort, (b) XLA take_along_axis per
plane, (c) a Pallas vreg-local gather kernel.

Run: python benchmarks/micro_regroup.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ptdn_tpu.utils.timing import fetch_scalar

N = 640 * 1024
NB = N // 128
K = 29


def timeit(tag, fn, *args, n=25):
    f = jax.jit(fn)
    out = f(*args)
    fetch_scalar(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

    def run(k):
        t0 = time.time()
        o = None
        for _ in range(k):
            o = f(*args)
        fetch_scalar(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0])
        return time.time() - t0

    t1 = run(5)
    t2 = run(n)
    ms = (t2 - t1) / (n - 5) * 1000.0
    print(f"{tag:56s} {ms:8.2f} ms", flush=True)
    return ms


rng = np.random.default_rng(0)
planes = jnp.asarray(rng.standard_normal((K, NB, 128), np.float32))
key2d = jnp.asarray(rng.integers(0, 1 << 20, (NB, 128)).astype(np.int32))

# (a) per-row argsort of keys (order indices for the in-row permute)
iota = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32), (NB, 128))
timeit("a: per-row argsort (sort_key_val axis=-1)",
       lambda k: jax.lax.sort_key_val(k, iota)[1], key2d)

order = jax.jit(lambda k: jax.lax.sort_key_val(k, iota)[1])(key2d)

# (b) apply the in-row permute to all K planes via XLA take_along_axis
timeit("b: in-row apply, XLA take_along_axis x K planes",
       lambda pl, o: jnp.take_along_axis(
           pl, jnp.broadcast_to(o[None], (K, NB, 128)), axis=2),
       planes, order)

# (b2) variadic sort: key + K planes in ONE lax.sort call
timeit("b2: variadic lax.sort (key + K payloads)",
       lambda k, pl: jax.lax.sort(
           (k,) + tuple(pl[i] for i in range(K)), dimension=1,
           num_keys=1)[1],
       key2d, planes)


# (c) Pallas vreg-local in-row gather kernel
def _kernel(o_ref, p_ref, out_ref):
    o = o_ref[0]                       # [8, 128] i32
    for k in range(K):
        out_ref[k] = jnp.take_along_axis(p_ref[k], o, axis=1)


def pallas_inrow(pl, o):
    from jax.experimental import pallas as plx

    return plx.pallas_call(
        _kernel,
        grid=(NB // 8,),
        in_specs=[plx.BlockSpec((1, 8, 128), lambda i: (0, i, 0)),
                  plx.BlockSpec((K, 8, 128), lambda i: (0, i, 0))],
        out_specs=plx.BlockSpec((K, 8, 128), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((K, NB, 128), jnp.float32),
    )(o[None], pl)


timeit("c: in-row apply, Pallas vreg-local gather", pallas_inrow,
       planes, order)

# (d) the full fresh-group pipeline at G=4: in-row sort + grouped gather
ng = N // 4
pg = jnp.asarray(rng.permutation(ng).astype(np.int32))


def full_fresh(pl, k, p):
    o = jax.lax.sort_key_val(k, iota)[1]
    pl2 = pallas_inrow(pl, o)
    return pl2.reshape(K, N).T.reshape(ng, 4 * K)[p].reshape(
        N, K).T.reshape(K, NB, 128)


timeit("d: FULL fresh-group permute (argsort+pallas+G4 gather)",
       full_fresh, planes, key2d, pg)

# reference: the G=1 production permute at this scale
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
timeit("e: G=1 full row-gather permute (production)",
       lambda pl, p: pl.reshape(K, N).T[p].T.reshape(K, NB, 128),
       planes, perm)
