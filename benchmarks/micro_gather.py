"""Micro-benchmark: gather formulations on TPU (640K random indices
into a 125K-entry table, the cornell texture-fetch shape)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ptdn_tpu.utils.timing import bench_slope

N = 640 * 1024
R = 1024            # table rows
W = 128             # table lanes
rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 2**24, size=(R * W,), dtype=np.int64)
                    .astype(np.uint32))
table2d = table.reshape(R, W)
idx = jnp.asarray(rng.integers(0, R * W, size=(N,), dtype=np.int64)
                  .astype(np.int32))
idx_sorted = jnp.sort(idx)


def run(name, f, *args):
    g = jax.jit(f)
    ms = bench_slope(g, *args, n1=4, n2=16)
    rate = N / ms / 1e3
    print(f"{name:42s} {ms:7.3f} ms   {rate:7.1f} M idx/s", flush=True)


run("flat table[idx] (current)", lambda i: table[i], idx)
run("jnp.take", lambda i: jnp.take(table, i), idx)
run("take unique_indices=True",
    lambda i: jnp.take(table, i, unique_indices=True), idx)
run("take sorted flag (really sorted)",
    lambda i: jnp.take(table, i, indices_are_sorted=True), idx_sorted)
run("2d table[row, lane]",
    lambda i: table2d[i >> 7, i & 127], idx)
run("flat, isolated (opt barrier)",
    lambda i: jax.lax.optimization_barrier(table)[i], idx)
run("take_along_axis 2d rows",
    lambda i: jnp.take_along_axis(
        table.reshape(1, R * W), i.reshape(1, N), axis=1), idx)
# gather wider rows per index: [R*W/4, 4] with quarter table rows
table_r4 = table.reshape(R * W // 4, 4)
idx_r4 = idx >> 2
run("row gather [.,4] (same idx count)", lambda i: table_r4[i], idx_r4)
# sort + sorted-gather + unsort (full pipeline cost)
def sort_gather(i):
    order = jnp.argsort(i)
    s = jnp.take(i, order)
    v = jnp.take(table, s, indices_are_sorted=True)
    return jnp.zeros_like(v).at[order].set(v)
run("argsort+sorted gather+scatter", sort_gather, idx)
