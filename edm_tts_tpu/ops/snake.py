"""Snake activation: ``x + sin^2(alpha * x) / alpha``.

The periodic activation used throughout the DAC encoder/decoder
(reference: /root/reference/edm_tts/models/dac/nn_layers.py:16-33, which
TorchScripts it for a 1.4x speedup). On TPU we simply express it in jnp —
XLA fuses the two transcendentals into the surrounding conv's epilogue, so a
hand-written kernel buys nothing for the memory-bound case; a Pallas fusion
of (snake -> strided conv) is provided in ``ops/pallas/`` for the decoder hot
path where it does.

``alpha`` is per-channel, broadcast over ``(B, T, C)`` channel-last input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def snake(x: Array, alpha: Array) -> Array:
    """Snake activation on channel-last input.

    Args:
      x: ``(..., C)``.
      alpha: ``(C,)`` trainable frequency (initialized to ones).
    """
    # Compute the sin in the input dtype (bf16 on TPU) but keep the
    # reciprocal numerically safe exactly as the reference does (+1e-9).
    s = jnp.sin(alpha * x)
    return x + s * s / (alpha + 1e-9)
