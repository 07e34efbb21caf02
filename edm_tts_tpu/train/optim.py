"""Optimizer / LR-schedule factories (optax).

Covers the reference's three training recipes:
- codec GAN: AdamW lr 1e-4 betas (0.8, 0.99) + per-step ExponentialLR
  gamma=0.999996 (configs/dac/train_config.yaml:30-48; gan_trainer.py:138,152
  steps the scheduler every batch — here the schedule is simply per-step);
- s2a/t2s: AdamW + linear-warmup cosine decay, grad clip 0.5, HF Trainer
  semantics (configs/injection_conformer/train_config.yaml:62-77).

Frozen subtrees (the codec embedded in the s2a model) are masked out of the
update — the JAX analogue of ``requires_grad=False``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax


def exponential_schedule(base_lr: float, gamma: float) -> optax.Schedule:
    """lr * gamma^step — torch ExponentialLR stepped per batch."""

    def schedule(step):
        return base_lr * gamma**step

    return schedule


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int, final_ratio: float = 0.0
) -> optax.Schedule:
    """HF-style linear warmup -> cosine decay to ``final_ratio * lr``."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=base_lr * final_ratio,
    )


def adamw(
    schedule: optax.Schedule | float,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    grad_clip: float | None = None,
    frozen_mask: Any | None = None,
) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping and a frozen-param mask.

    ``frozen_mask``: pytree of bools (True = trainable) matching params.
    """
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda trainable: "train" if trainable else "freeze", frozen_mask
            ),
        )
    return tx


def freeze_subtree_mask(params, frozen_key: str):
    """Bool mask pytree: False for every leaf under ``params[...][frozen_key]``.

    Used to freeze the embedded codec inside the s2a model (reference
    modeling_injection_conformer.py:31-37 sets requires_grad=False).
    """

    def walk(tree, frozen):
        if isinstance(tree, dict):
            return {
                k: walk(v, frozen or k == frozen_key) for k, v in tree.items()
            }
        return jax.tree_util.tree_map(lambda _: not frozen, tree)

    return walk(params, False)
