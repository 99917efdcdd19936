"""Micro-bench: the per-bounce permute gather at bunny scale.

profile_mesh.py shows permute_by_key = 8.4 ms/bounce on bunny (of a
19.7 ms bounce) — this isolates each candidate formulation of the
packed-plane permutation at N=640k, K=29 planes (the production
widths) to find the fastest one. Run: python benchmarks/micro_permute.py
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


def timeit(tag, fn, *args, n=30):
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
    print(f"{tag:52s} {ms:8.2f} ms", flush=True)
    return ms


rng = np.random.default_rng(0)
planes = jnp.asarray(rng.standard_normal((K, NB, 128), np.float32))
rows = jnp.asarray(rng.standard_normal((N, K), dtype=np.float32))
# realistic sorted-ish permutation: locally coherent (sorted morton-ish)
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
half = jnp.asarray(rng.permutation(N // 2).astype(np.int32))

print(f"N={N}, K={K} planes ({K * N * 4 / 1e6:.0f} MB table)")

timeit("A: planes->T->row-gather->T (production shape)",
       lambda pl, p: pl.reshape(K, N).T[p].T.reshape(K, NB, 128),
       planes, perm)
timeit("B: row gather only (pre-transposed rows)",
       lambda r, p: r[p], rows, perm)
timeit("C: row gather HALF rows (320k)",
       lambda r, p: r[:N // 2][p], rows, half)
timeit("D: 8-wide col groups (planes layout)",
       lambda pl, p: jnp.concatenate(
           [pl[lo:min(lo + 8, K)].reshape(-1, N).T[p].T.reshape(
               min(lo + 8, K) - lo, NB, 128)
            for lo in range(0, K, 8)], axis=0),
       planes, perm)
timeit("E: transpose planes->rows only",
       lambda pl: pl.reshape(K, N).T, planes)
timeit("F: transpose rows->planes only",
       lambda r: r.T.reshape(K, NB, 128), rows)
timeit("G: row gather bf16 rows",
       lambda r, p: r[p], rows.astype(jnp.bfloat16), perm)
timeit("H: 4 gathers of (N, 8) row slices",
       lambda r, p: jnp.concatenate(
           [r[:, lo:min(lo + 8, K)][p] for lo in range(0, K, 8)],
           axis=1),
       rows, perm)
# one-hot MXU permute of a 1024-lane TILE x whole table is O(N^2) — skip.
# sorted-segment DMA idea: gather indices are mostly short ascending
# runs after a coherence sort; emulate with a locally-banded perm
band = np.arange(N, dtype=np.int32).reshape(-1, 4096)
for b in band:
    rng.shuffle(b)
banded = jnp.asarray(band.reshape(-1))
timeit("I: row gather, BANDED perm (4096-local)",
       lambda r, p: r[p], rows, banded)
timeit("J: planes->T->gather->T, BANDED perm",
       lambda pl, p: pl.reshape(K, N).T[p].T.reshape(K, NB, 128),
       planes, banded)

# K-lane GROUP granularity: gather (N/G, G*K) rows — count-bound means
# grouping should cut the cost ~G-fold (coherence cost paid in the
# trace kernel instead, measured separately)
for G in (2, 4, 8):
    ng = N // G
    pg = jnp.asarray(rng.permutation(ng).astype(np.int32))
    timeit(f"K{G}: planes->T->group-reshape->gather->T (G={G})",
           lambda pl, p, G=G, ng=ng: pl.reshape(K, N).T.reshape(
               ng, G * K)[p].reshape(N, K).T.reshape(K, NB, 128),
           planes, pg)

# 1080p scale: N2=2073600 lanes -> 240 MB table, ABOVE the ~110 MB
# gather cliff. Which formulation wins there: 8-wide column groups
# (the G=1 production choice), one wide grouped gather, or grouped
# gathers of column slices?
N2 = 1920 * 1080
NB2 = N2 // 128
planes2 = jnp.asarray(rng.standard_normal((K, NB2, 128), np.float32))
perm2 = jnp.asarray(rng.permutation(N2).astype(np.int32))
print(f"N2={N2} ({K * N2 * 4 / 1e6:.0f} MB table)")
timeit("L1: G=1 8-wide col groups (production 1080p)",
       lambda pl, p: jnp.concatenate(
           [pl[lo:min(lo + 8, K)].reshape(-1, N2).T[p].T.reshape(
               min(lo + 8, K) - lo, NB2, 128)
            for lo in range(0, K, 8)], axis=0),
       planes2, perm2)
timeit("L2: G=1 single row gather",
       lambda pl, p: pl.reshape(K, N2).T[p].T.reshape(K, NB2, 128),
       planes2, perm2)
for G in (4, 8):
    ng2 = N2 // G
    pg2 = jnp.asarray(rng.permutation(ng2).astype(np.int32))
    timeit(f"L3-G{G}: grouped single gather",
           lambda pl, p, G=G, ng2=ng2: pl.reshape(K, N2).T.reshape(
               ng2, G * K)[p].reshape(N2, K).T.reshape(K, NB2, 128),
           planes2, pg2)
    timeit(f"L4-G{G}: grouped gather of 8-plane col slices",
           lambda pl, p, G=G, ng2=ng2: jnp.concatenate(
               [pl[lo:min(lo + 8, K)].reshape(-1, N2).T.reshape(
                   ng2, G * (min(lo + 8, K) - lo))[p].reshape(
                   N2, -1).T.reshape(-1, NB2, 128)
                for lo in range(0, K, 8)], axis=0),
           planes2, pg2)
