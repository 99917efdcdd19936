"""Micro-bench: per-bounce ray-reorder primitives on TPU.

Measures what a coherence sort between bounces would cost at 800x800
(N=640k rays): key argsort, packed-row permutation gather, plane
transposes, and final pixel scatter. Decides the sorted-wavefront
design (docs/PERF_NOTES.md)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ptdn_tpu.utils.timing import fetch_scalar

N = 640 * 1024
P = 16


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
    print(f"{tag:44s} {ms:8.2f} ms", flush=True)
    return ms


rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 1 << 18, N, dtype=np.uint32))
vals = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))
rows = jnp.asarray(rng.standard_normal((N, P), dtype=np.float32))
planes = jnp.asarray(rng.standard_normal((P, N // 128, 128), np.float32))
perm = jnp.asarray(rng.permutation(N).astype(np.int32))

timeit("argsort u32 keys (640k)", lambda k: jnp.argsort(k), keys)
timeit("sort_key_val u32/i32 (640k)",
       lambda k, v: jax.lax.sort_key_val(k, v), keys, vals)
timeit("row gather (640k, 16) f32", lambda r, p: r[p], rows, perm)
timeit("flat gather (640k,) f32", lambda r, p: r[:, 0][p], rows, perm)
timeit("planes->rows transpose (16 planes)",
       lambda pl: pl.reshape(P, N).T, planes)
timeit("rows->planes transpose",
       lambda r: r.T.reshape(P, N // 128, 128), rows)
timeit("scatter rows (640k,16)",
       lambda r, p: jnp.zeros_like(r).at[p].set(r), rows, perm)
timeit("scatter flat (640k,3)",
       lambda r, p: jnp.zeros((N, 3), jnp.float32).at[p].set(r[:, :3]),
       rows, perm)
timeit("key compute (morton 6bit^3 from 3 planes)",
       lambda pl: ((pl[0].astype(jnp.int32) & 63)
                   | ((pl[1].astype(jnp.int32) & 63) << 6)
                   | ((pl[2].astype(jnp.int32) & 63) << 12)), planes)
