"""Timing helpers that are correct on remote-tunneled devices (axon).

Through the axon tunnel, jax.block_until_ready() is not a reliable
completion barrier and every host fetch costs a ~25ms round trip. The
robust pattern is SLOPE timing: dispatch the op n1 and n2 times with a
data dependency chaining iterations, fetch one scalar at the end of each
run, and take (t2 - t1) / (n2 - n1) — the tunnel round trip and dispatch
overheads cancel.
"""

from __future__ import annotations

import time


def fetch_scalar(tree) -> float:
    """Force completion by fetching ONE element of one leaf (1 round trip)."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.ravel(leaf)[0])


def bench_slope(fn, *args, n1: int = 5, n2: int = 20, chain=None):
    """ms per call via two-point slope.

    chain(out, args) -> args may thread the output into the next call's
    inputs to enforce serialization; if None, relies on same-device
    program-order execution.
    """
    def run(n):
        a = args
        out = None
        t0 = time.time()
        for _ in range(n):
            out = fn(*a)
            if chain is not None:
                a = chain(out, a)
        fetch_scalar(out)
        return time.time() - t0

    run(2)  # warmup/compile
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1000.0


def sync(tree) -> float:
    """Force completion of the first leaf (one tunnel round trip)."""
    return fetch_scalar(tree)
