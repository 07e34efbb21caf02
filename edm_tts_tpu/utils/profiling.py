"""Tracing / profiling hooks (jax.profiler).

The reference has no first-party tracing (SURVEY.md §5 — only torch.compile
and tqdm); here profiling is first-class: a context manager producing
TensorBoard-viewable xplane traces, per-step ``StepTraceAnnotation``s for the
trainer loops, and a lightweight wall-time scope timer.
"""

from __future__ import annotations

import contextlib
import time

import jax

from edm_tts_tpu.utils.logging import logger


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('exp/prof'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("wrote profiler trace to %s", log_dir)


def step_annotation(name: str, step: int):
    """Annotate one training step for the trace viewer."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


@contextlib.contextmanager
def timed(name: str, sync: bool = False):
    """Host wall-clock scope timer (optionally syncing outstanding work)."""
    t0 = time.perf_counter()
    yield
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    logger.info("%s: %.1f ms", name, (time.perf_counter() - t0) * 1e3)
