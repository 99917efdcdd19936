"""Probe: which take_along_axis shapes lower inside Pallas TPU kernels,
and how fast do they run? (tpu.dynamic_gather capability map)"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptdn_tpu.utils.timing import bench_slope


def kern(x_ref, i_ref, o_ref, *, axis, reps):
    x = x_ref[:]
    idx = i_ref[:]
    acc = jnp.take_along_axis(x, idx, axis=axis)
    for _ in range(reps - 1):
        # serial chain to measure per-op throughput
        acc = jnp.take_along_axis(x, (idx + acc.astype(jnp.int32)) % x.shape[axis], axis=axis)
    o_ref[:] = acc


def probe(S, L, axis, reps=1, time_it=False):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1000, size=(S, L)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, (S, L)[axis], size=(S, L)).astype(np.int32))
    f = pl.pallas_call(
        functools.partial(kern, axis=axis, reps=reps),
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32),
    )
    try:
        out = jax.jit(f)(x, idx)
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=axis)
        ok = np.array_equal(np.asarray(out), ref) if reps == 1 else True
        msg = "OK" if ok else "WRONG RESULT"
    except Exception as e:
        msg = f"FAIL: {str(e).splitlines()[0][:90]}"
        print(f"axis={axis} [{S:5d},{L:5d}] {msg}", flush=True)
        return
    if time_it:
        ms = bench_slope(jax.jit(f), x, idx, n1=4, n2=16)
        per = ms * 1e6 / (S * L * reps)
        print(f"axis={axis} [{S:5d},{L:5d}] reps={reps:3d} {msg} "
              f"{ms:8.3f} ms  {per:7.2f} ns/elem", flush=True)
    else:
        print(f"axis={axis} [{S:5d},{L:5d}] {msg}", flush=True)


for axis in (0, 1):
    for S, L in [(8, 128), (32, 128), (256, 128), (1024, 128),
                 (8, 256), (8, 1024), (8, 16384), (256, 512)]:
        probe(S, L, axis)

print("--- timing (reps to amortize) ---", flush=True)
probe(1024, 128, 0, reps=16, time_it=True)
probe(1024, 128, 1, reps=16, time_it=True)
probe(8, 16384, 1, reps=16, time_it=True)
probe(256, 512, 0, reps=16, time_it=True)
