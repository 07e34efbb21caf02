"""MaskGIT-style masking/sampling primitives, static-shape and jit-friendly.

The reference's two generative stages both use confidence-based iterative
parallel decoding: a cosine mask schedule with Bernoulli draws for training
(/root/reference/edm_tts/models/injection_conformer/modeling_injection_conformer.py:62-74,
 /root/reference/edm_tts/models/text_to_semantic/modeling_text_to_semantic.py:64-75)
and gumbel-perturbed top-k re-masking during sampling
(/root/reference/edm_tts/utils/utils.py:49-60). Everything here threads
explicit PRNG keys and keeps shapes static so the samplers compile into a
single ``lax.scan``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def cosine_schedule_mask(
    key: Array, batch_size: int, length: int, *, per_position_draw: bool = True
) -> Array:
    """Draw a Bernoulli mask with rate ``cos(u)``, ``u ~ U(0, pi/2)`` per sample.

    Returns a bool ``(batch, length)`` mask (True = masked). The masking rate
    is shared across the sequence within one sample (one ``u`` per sample),
    matching both reference stages.
    """
    u_key, b_key = jax.random.split(key)
    u = jax.random.uniform(u_key, (batch_size, 1), minval=0.0, maxval=math.pi / 2)
    p = jnp.cos(u)
    return jax.random.uniform(b_key, (batch_size, length)) < p


def sampling_mask_ratios(steps: int) -> jnp.ndarray:
    """``cos(pi/2 * (t+1)/steps)`` for t in [0, steps) — the sampler schedule."""
    t = jnp.arange(1, steps + 1, dtype=jnp.float32) / steps
    return jnp.cos(math.pi / 2.0 * t)


def positional_keys(key: Array, batch: int, length: int) -> Array:
    """Counter-based per-position PRNG keys ``(B, T)``.

    The key at ``[b, t]`` depends only on (key, b, t) — NOT on the canvas
    shape — so sampling on a padded (bucketed) canvas draws bit-identical
    randoms at valid positions to an exact-size canvas. This is what makes
    the bucketed staged-inference path equal the exact-length run even
    through the stochastic MaskGIT iterations.
    """
    idx = jnp.arange(batch)[:, None] * (1 << 20) + jnp.arange(length)[None, :]
    return jax.vmap(jax.vmap(lambda i: jax.random.fold_in(key, i)))(idx)


def positional_gumbel(key: Array, batch: int, length: int) -> Array:
    """Canvas-size-invariant gumbel noise ``(B, T)`` (see positional_keys)."""
    ks = positional_keys(key, batch, length)
    return jax.vmap(jax.vmap(lambda k: jax.random.gumbel(k, ())))(ks)


def positional_categorical(key: Array, logits: Array) -> Array:
    """Categorical sample per position via gumbel-argmax with per-position
    counter-based keys: ``(B, T, N)`` logits -> ``(B, T)`` int32 samples whose
    value at a position is independent of the canvas length."""
    b, t, n = logits.shape
    ks = positional_keys(key, b, t)
    g = jax.vmap(jax.vmap(lambda k: jax.random.gumbel(k, (n,))))(ks)
    return jnp.argmax(logits.astype(jnp.float32) + g, axis=-1).astype(jnp.int32)


def random_topk_mask(
    key: Array,
    mask_len: Array,
    probs: Array,
    *,
    temperature: float | Array = 1.0,
    gumbel: Array | None = None,
) -> Array:
    """Re-mask the ``mask_len`` lowest-confidence positions.

    Confidence is ``log(probs) + temperature * gumbel``; the ``mask_len``-th
    smallest confidence per row is the cut-off and everything strictly below
    it is re-masked — identical semantics to the reference's
    ``random_topk_mask`` (utils.py:49-60), expressed with a sort + row gather
    so it stays static-shape.

    Args:
      key: PRNG key.
      mask_len: ``(B,)`` number of positions to re-mask (int or float; floored).
      probs: ``(B, T)`` per-position confidence; positions that must never be
        re-masked should carry ``+inf``.
      gumbel: optional pre-drawn ``(B, T)`` gumbel noise (e.g. positional);
        drawn from ``key`` when absent.
    Returns bool ``(B, T)``; True = masked.
    """
    if gumbel is None:
        gumbel = jax.random.gumbel(key, probs.shape)
    confidence = jnp.log(probs) + temperature * gumbel
    sorted_conf = jnp.sort(confidence, axis=-1)
    idx = jnp.clip(mask_len.astype(jnp.int32), 0, probs.shape[-1] - 1)
    cut_off = jnp.take_along_axis(sorted_conf, idx[:, None], axis=-1)
    return confidence < cut_off


def masked_mean(values: Array, mask: Array, *, eps: float = 1e-9) -> Array:
    """Mean of ``values`` over positions where ``mask`` is True (any shape)."""
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / (jnp.sum(mask) + eps)
