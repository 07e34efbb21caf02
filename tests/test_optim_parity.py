"""Differential optimizer/LR-schedule parity: our optax factories
(`train/optim.py`) vs the exact torch optimization path the reference
trains with, fed IDENTICAL injected gradients.

This isolates update-rule semantics from model numerics (loss/grad parity is
covered by test_train_loss_parity.py / test_convert_*.py): bias correction,
decoupled weight decay placement, the ExponentialLR-per-batch quirk
(gan_trainer.py:138,152), HF cosine-with-warmup (first step at lr 0), and
global-norm clipping before AdamW (HF Trainer order).

Reference recipes pinned here:
- codec GAN: torch AdamW lr 1e-4 betas (0.8, 0.99) and the torch DEFAULT
  weight_decay 0.01 (run_codec_training.py builds ``getattr(torch.optim,
  'AdamW')(params, lr=..., betas=...)`` with no wd arg,
  configs/dac/train_config.yaml:30-42) + ExponentialLR gamma 0.999996.
- s2a/t2s: AdamW lr 3e-4/2.5e-4 betas (0.8, 0.99) eps 1e-8 wd 0.0,
  max_grad_norm 0.5, cosine schedule with 4000 warmup
  (configs/injection_conformer/train_config.yaml:62-70) — HF Trainer =
  clip_grad_norm_ then AdamW.step then scheduler.step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch
from transformers import get_cosine_schedule_with_warmup

from edm_tts_tpu.train.optim import (
    adamw,
    exponential_schedule,
    warmup_cosine_schedule,
)

SHAPES = {"w": (7, 5), "b": (5,), "deep": {"k": (3, 11)}}


def _make_params(seed):
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda shp: rng.standard_normal(shp).astype(np.float32),
        SHAPES,
        is_leaf=lambda x: isinstance(x, tuple),
    )


def _make_grads(seed, n_steps, scale=1.0):
    rng = np.random.default_rng(seed)
    return [
        jax.tree_util.tree_map(
            lambda shp: (scale * rng.standard_normal(shp)).astype(np.float32),
            SHAPES,
            is_leaf=lambda x: isinstance(x, tuple),
        )
        for _ in range(n_steps)
    ]


def _run_optax(tx, params, grads):
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = tx.init(params)
    for g in grads:
        g = jax.tree_util.tree_map(jnp.asarray, g)
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return jax.tree_util.tree_map(np.asarray, params)


def _run_torch(params, grads, make_opt, make_sched=None, clip=None):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    tensors = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in leaves]
    opt = make_opt(tensors)
    sched = make_sched(opt) if make_sched else None
    for g in grads:
        g_leaves = jax.tree_util.tree_flatten(g)[0]
        for p, gl in zip(tensors, g_leaves):
            p.grad = torch.from_numpy(gl.copy())
        if clip is not None:
            torch.nn.utils.clip_grad_norm_(tensors, clip)
        opt.step()
        if sched is not None:
            sched.step()
        opt.zero_grad(set_to_none=True)
    out = [p.detach().numpy() for p in tensors]
    return jax.tree_util.tree_unflatten(treedef, out)


def _assert_tree_close(a, b, atol=2e-6):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-5, atol=atol),
        a,
        b,
    )


def test_gan_adamw_exponential_lr_matches_torch():
    params = _make_params(0)
    grads = _make_grads(1, 6)
    mine = _run_optax(
        adamw(
            exponential_schedule(1e-4, 0.999996),
            b1=0.8,
            b2=0.99,
            weight_decay=0.01,
        ),
        params,
        grads,
    )
    ref = _run_torch(
        params,
        grads,
        make_opt=lambda ps: torch.optim.AdamW(ps, lr=1e-4, betas=(0.8, 0.99)),
        make_sched=lambda o: torch.optim.lr_scheduler.ExponentialLR(
            o, gamma=0.999996
        ),
    )
    _assert_tree_close(mine, ref)


def test_trainer_adamw_cosine_warmup_clip_matches_hf():
    warmup, total = 4, 16
    params = _make_params(2)
    # large grads so global-norm clipping actually triggers every step
    grads = _make_grads(3, total, scale=2.0)
    mine = _run_optax(
        adamw(
            warmup_cosine_schedule(3e-4, warmup, total),
            b1=0.8,
            b2=0.99,
            eps=1e-8,
            weight_decay=0.0,
            grad_clip=0.5,
        ),
        params,
        grads,
    )
    ref = _run_torch(
        params,
        grads,
        make_opt=lambda ps: torch.optim.AdamW(
            ps, lr=3e-4, betas=(0.8, 0.99), eps=1e-8, weight_decay=0.0
        ),
        make_sched=lambda o: get_cosine_schedule_with_warmup(o, warmup, total),
        clip=0.5,
    )
    _assert_tree_close(mine, ref)


def test_warmup_cosine_schedule_values_match_hf_lambda():
    """Pointwise schedule parity across the whole horizon (incl. lr=0 at
    step 0 — HF's first optimizer step runs at zero lr — the warmup knee,
    and the cosine tail to exactly 0)."""
    warmup, total, base = 4000, 100_000, 3e-4
    sched = warmup_cosine_schedule(base, warmup, total)
    for step in [0, 1, 399, 4000, 4001, 50_000, 99_999, 100_000]:
        if step < warmup:
            hf = base * step / warmup
        else:
            progress = (step - warmup) / (total - warmup)
            hf = base * max(0.0, 0.5 * (1.0 + np.cos(np.pi * progress)))
        np.testing.assert_allclose(float(sched(step)), hf, rtol=1e-6, atol=1e-12)
