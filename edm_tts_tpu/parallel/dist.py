"""Multi-host initialization & collective helpers.

The reference's multi-process story is ``accelerate launch`` (8 ranks, NCCL;
configs/acc_cfg*.yaml). TPU-native: one python process per host;
``jax.distributed.initialize`` wires the pod; data loading shards by
``jax.process_index()``; device-level collectives are emitted by XLA from
pjit shardings. These helpers cover the host-level operations the trainers
and dump jobs need (barrier, host all-gather of metrics).
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-host JAX (no-op on a single host / TPU pod slice
    where the runtime auto-configures)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        pass  # single-process run


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def barrier(name: str = "barrier") -> None:
    """Cross-host sync (the reference's ``accelerator.wait_for_everyone``,
    dump_tokens.py:253): a tiny psum across all devices."""
    x = jax.numpy.ones((jax.local_device_count(),))
    jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x).block_until_ready()


def all_gather_metrics(value: float) -> np.ndarray:
    """Gather one host-level scalar from every process (the
    ``gather_for_metrics`` analog, gan_trainer.py:234)."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray([value]))
    ).reshape(-1)


def global_mean_metrics(totals: dict, count: int) -> dict:
    """Global weighted mean of per-rank metric sums.

    Each rank passes its local metric SUMS and batch count; the result is
    the mean over every batch on every rank — so all hosts report identical
    eval metrics and make identical best-model decisions, matching the
    reference's ``gather_for_metrics`` eval (gan_trainer.py:229-248). On a
    single process this is just ``totals / count``.
    """
    if jax.process_count() == 1:
        return {k: v / max(count, 1) for k, v in totals.items()}
    from jax.experimental import multihost_utils

    keys = sorted(totals)
    vec = np.asarray([float(totals[k]) for k in keys] + [float(count)])
    sums = np.asarray(multihost_utils.process_allgather(vec)).reshape(
        jax.process_count(), -1
    ).sum(axis=0)
    n = max(sums[-1], 1.0)
    return {k: float(sums[i]) / n for i, k in enumerate(keys)}
