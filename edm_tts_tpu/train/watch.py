"""Per-tensor gradient/parameter watching (the ``wandb.watch`` analog).

The reference enables ``WANDB_WATCH=all`` for codec training
(/root/reference/run_codec_training.py:201), which makes wandb log
per-tensor gradient and parameter histograms every ``logging_steps``.
TPU-native reformulation: full histograms would force a host transfer of
every tensor through the tunnel each log step, so we log per-tensor L2
norms instead — computed INSIDE the jitted train step (a handful of fused
reductions over arrays the step already reads; negligible), fetched only
when the host loop logs. Norm trajectories catch the same failure classes
histograms are watched for (vanishing/exploding subtrees, dead adapters,
one layer's grads blowing up before the global norm does).

Modes mirror wandb's: ``"gradients"`` logs grad norms, ``"parameters"``
param norms, ``"all"`` both (WANDB_WATCH vocabulary, minus "false").
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

WATCH_MODES = ("gradients", "parameters", "all")


def _leaf_name(path) -> str:
    """'/'-joined readable key path, e.g. params/encoder/layers_0/kernel."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:  # pragma: no cover - GetAttrKey etc.
            parts.append(str(p).strip(".[]'"))
    return "/".join(parts)


def _norms(tree: Any, prefix: str) -> dict[str, jax.Array]:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        f"{prefix}{_leaf_name(path)}": jnp.linalg.norm(
            jnp.asarray(leaf, jnp.float32).ravel()
        )
        for path, leaf in leaves
    }


def watch_metrics(
    mode: str | None, grads: Any = None, params: Any = None
) -> dict[str, jax.Array]:
    """Per-tensor L2 norms to merge into a train step's metrics dict.

    Keys: ``watch/grad_norm/<path>`` and ``watch/param_norm/<path>``.
    ``mode`` None/"false" returns {} so call sites can pass the arg through
    unconditionally.
    """
    if not mode or mode == "false":
        return {}
    if mode not in WATCH_MODES:
        raise ValueError(f"watch mode {mode!r} not in {WATCH_MODES}")
    out: dict[str, jax.Array] = {}
    if grads is not None and mode in ("gradients", "all"):
        out.update(_norms(grads, "watch/grad_norm/"))
    if params is not None and mode in ("parameters", "all"):
        out.update(_norms(params, "watch/param_norm/"))
    return out
