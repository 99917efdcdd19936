"""Isolate the data-independent per-bounce pipeline stages on a mesh
scene: coherence sort, packed permute gather, first-chunk key planes.

These are count-bound (cost does not depend on ray values), so synthetic
inputs give honest numbers; the fused trace kernel's cost is the
residual of the full-frame profile (benchmarks/profile_focus.py) after
subtracting these.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ptdn_tpu.scene import Scene
from ptdn_tpu.utils.timing import bench_slope

name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
scene = Scene(__import__("ptdn_tpu.utils.assets", fromlist=["scene_path"]).scene_path(name))
ds = scene.device()
n = 800 * 800
nb = n // 128
n_chunks = int(ds.tri_chunk_min.shape[0]) // 5
print(f"{name}: n={n} nb={nb} chunks={n_chunks}", flush=True)

rng = np.random.default_rng(0)

# ---- 1. sort_key_val over n lanes ----
key0 = jnp.asarray(rng.integers(0, n_chunks * n_chunks, size=n, dtype=np.int32))


@jax.jit
def f_sort(key):
    order = jax.lax.sort_key_val(key, jnp.arange(n, dtype=jnp.int32))[1]
    return order, order ^ 1


ms = bench_slope(lambda k: f_sort(k), key0, n1=4, n2=16,
                 chain=lambda out, a: (out[1],))
print(f"sort_key_val (n i32):            {ms:7.2f} ms", flush=True)

# ---- 2. packed permute gather: 24 planes x n lanes ----
K = 24
allp0 = jnp.asarray(rng.normal(size=(K, nb, 128)).astype(np.float32))
order0 = jnp.asarray(rng.permutation(n).astype(np.int32))


@jax.jit
def f_perm(allp, order):
    rows = allp.reshape(K, n).T[order]
    out = rows.T.reshape(K, nb, 128)
    return out, out[0]


ms = bench_slope(lambda a, o: f_perm(a, o), allp0, order0, n1=4, n2=16,
                 chain=lambda out, args: (out[0], args[1]))
print(f"permute gather ({K} planes):      {ms:7.2f} ms", flush=True)

# ---- 3. first-chunk planes (2x per bounce) ----
o = jnp.asarray(rng.normal(size=(3, nb, 128)).astype(np.float32))
d_ = rng.normal(size=(3, nb, 128)).astype(np.float32)
d0 = jnp.asarray(d_ / np.linalg.norm(d_, axis=0, keepdims=True))

cmin = ds.tri_chunk_min
cmax = ds.tri_chunk_max


@jax.jit
def f_fc(o, d):
    ox, oy, oz = o[0], o[1], o[2]
    dx, dy, dz = d[0], d[1], d[2]
    idx, idy, idz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    best_t = jnp.full(ox.shape, 3.4e38)
    best_c = jnp.full(ox.shape, n_chunks, jnp.int32)
    for c in range(n_chunks):
        t0x = (cmin[c, 0] - ox) * idx
        t1x = (cmax[c, 0] - ox) * idx
        t0y = (cmin[c, 1] - oy) * idy
        t1y = (cmax[c, 1] - oy) * idy
        t0z = (cmin[c, 2] - oz) * idz
        t1z = (cmax[c, 2] - oz) * idz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        better = (tmax >= 0.0) & (tmin <= tmax) & (tmin < best_t)
        best_t = jnp.where(better, tmin, best_t)
        best_c = jnp.where(better, c, best_c)
    return best_c, o + best_t[None] * 1e-30


ms = bench_slope(lambda o, d: f_fc(o, d), o, d0, n1=4, n2=16,
                 chain=lambda out, args: (out[1], args[1]))
print(f"first_chunk plane (1x):          {ms:7.2f} ms", flush=True)


# ---- 4. grouped permute: sort G-lane groups instead of lanes ----
for G in (8, 32, 128):
    ng = n // G
    orderg0 = jnp.asarray(rng.permutation(ng).astype(np.int32))

    def f_permg(allp, order, G=G, ng=ng):
        cols = allp.reshape(K, ng, G).transpose(1, 0, 2).reshape(ng, K * G)
        rows = cols[order]
        out = rows.reshape(ng, K, G).transpose(1, 0, 2).reshape(K, nb, 128)
        return out, out[0]

    f_permg = jax.jit(f_permg)
    ms = bench_slope(lambda a, o: f_permg(a, o), allp0, orderg0, n1=4,
                     n2=16, chain=lambda out, args: (out[0], args[1]))
    print(f"grouped permute G={G:3d}:           {ms:7.2f} ms", flush=True)

    key0g = jnp.asarray(rng.integers(0, n_chunks * n_chunks, size=ng,
                                     dtype=np.int32))

    def f_sortg(key, ng=ng):
        order = jax.lax.sort_key_val(key, jnp.arange(ng, dtype=jnp.int32))[1]
        return order, order ^ 1

    f_sortg = jax.jit(f_sortg)
    ms = bench_slope(lambda k: f_sortg(k), key0g, n1=4, n2=16,
                     chain=lambda out, a: (out[1],))
    print(f"grouped sort    G={G:3d}:           {ms:7.2f} ms", flush=True)
