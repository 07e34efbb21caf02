"""Shared benchmark helpers: timing against the axon tunnel (force host
transfers — block_until_ready does not synchronize on this backend)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def timeit(fn, n=10):
    """Sustained wall time per fn() call: queue all n dispatches back-to-back
    and force completion once with a single host transfer at the end. Device
    compute serializes across queued programs, so wall/n is per-call compute;
    per-run np.asarray timing instead measures the tunnel (~4 ms dispatch +
    the output pull, with +-30 ms congestion swings — see bench.py)."""
    _ = np.asarray(jax.tree_util.tree_leaves(fn(0))[0])  # warmup/compile
    t0 = time.perf_counter()
    outs = [fn(i + 1) for i in range(n)]
    _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.perf_counter() - t0) / n


def report(metric, value, unit, baseline=None):
    rec = {"metric": metric, "value": round(value, 5), "unit": unit}
    if baseline is not None:
        rec["vs_baseline"] = round(baseline / value, 3)
    print(json.dumps(rec))
