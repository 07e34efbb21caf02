"""Codec encoder: strided conv stack, 16 kHz waveform -> 50 Hz latents.

Architecture parity with the reference DAC encoder
(/root/reference/edm_tts/models/dac/encoder.py:11-58): k=7 stem, four
EncoderBlocks doubling channels while downsampling by strides (2,4,5,8)
(each: 3 ResidualUnits with dilations 1/3/9, Snake, strided conv with
k=2*stride, pad=ceil(stride/2)), then Snake + k=3 conv. ``enc_dim`` = 64*2^4
= 1024. Channel-last throughout; the 320x downsampling happens in conv
strides that XLA maps onto the MXU as im2col matmuls.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from edm_tts_tpu.models.codec.layers import ResidualUnit, Snake, WNConv1d

Array = jax.Array


class EncoderBlock(nn.Module):
    dim: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        half = self.dim // 2
        x = ResidualUnit(half, dilation=1, dtype=self.dtype)(x)
        x = ResidualUnit(half, dilation=3, dtype=self.dtype)(x)
        x = ResidualUnit(half, dilation=9, dtype=self.dtype)(x)
        x = Snake()(x)
        return WNConv1d(
            self.dim,
            2 * self.stride,
            stride=self.stride,
            padding=math.ceil(self.stride / 2),
            dtype=self.dtype,
        )(x)


class Encoder(nn.Module):
    d_model: int = 64
    strides: Sequence[int] = (2, 4, 5, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: Array) -> Array:
        """``(B, T, 1)`` waveform -> ``(B, T/prod(strides), enc_dim)`` latents."""
        d = self.d_model
        x = WNConv1d(d, 7, padding=3, dtype=self.dtype)(audio)
        for stride in self.strides:
            d *= 2
            x = EncoderBlock(d, stride, dtype=self.dtype)(x)
        x = Snake()(x)
        return WNConv1d(d, 3, padding=1, dtype=self.dtype)(x)
