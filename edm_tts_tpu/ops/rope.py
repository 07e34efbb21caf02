"""Rotary position embeddings (lucidrains convention).

Matches the reference Conformer's RotaryEmbedding
(/root/reference/edm_tts/models/conformer/conformer.py:28-51): frequencies are
``1 / theta^(2i/d)``, the freq vector is concatenated with itself (NOT
interleaved), and ``rotate_half`` splits the head dim into two contiguous
halves. Applied to q and k before attention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rope_frequencies(seq_len: int, dim: int, theta: float = 10000.0) -> Array:
    """Return ``(seq_len, dim)`` angle matrix (f32)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)


def rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(freqs: Array, t: Array) -> Array:
    """Apply rotary embedding. ``t``: ``(..., seq, dim)``; ``freqs``: ``(seq, dim)``."""
    cos = jnp.cos(freqs).astype(t.dtype)
    sin = jnp.sin(freqs).astype(t.dtype)
    return t * cos + rotate_half(t) * sin
