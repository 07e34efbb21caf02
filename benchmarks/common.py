"""Shared benchmark helpers: timing against the axon tunnel (force host
transfers — block_until_ready does not synchronize on this backend)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def timeit(fn, n=5):
    """Median wall time of fn() with a forced host transfer per call."""
    _ = np.asarray(jax.tree_util.tree_leaves(fn(0))[0])  # warmup/compile
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        out = fn(i + 1)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def report(metric, value, unit, baseline=None):
    rec = {"metric": metric, "value": round(value, 5), "unit": unit}
    if baseline is not None:
        rec["vs_baseline"] = round(baseline / value, 3)
    print(json.dumps(rec))
