"""Codec decoder: 50 Hz latents -> 16 kHz waveform via transposed convs.

Architecture parity with the reference DAC decoder
(/root/reference/edm_tts/models/dac/decoder.py:11-62): k=7 stem
(1024 -> 1536), four DecoderBlocks halving channels while upsampling by
rates (8,5,4,2) (each: Snake, ConvTranspose k=2*stride / pad=floor(stride/2)
/ output_padding=stride%2, then 3 ResidualUnits dil 1/3/9), final Snake +
k=7 conv to 1 channel + tanh. This stack runs at audio rate and is the RTF
hot path; channels stay multiples of 128 until the last two blocks so the
MXU stays fed, and bf16 compute is the default at inference.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from edm_tts_tpu.models.codec.layers import (
    ResidualUnit,
    Snake,
    WNConv1d,
    WNConvTranspose1d,
)

Array = jax.Array


class DecoderBlock(nn.Module):
    output_dim: int
    stride: int
    dtype: Any = jnp.float32
    use_pallas: str | bool = "auto"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        snake0 = Snake()
        tconv = WNConvTranspose1d(
            self.output_dim,
            2 * self.stride,
            stride=self.stride,
            padding=math.floor(self.stride / 2),
            output_padding=self.stride % 2,
            dtype=self.dtype,
        )
        units = [
            ResidualUnit(self.output_dim, dilation=d, dtype=self.dtype)
            for d in (1, 3, 9)
        ]

        use_pallas = self.use_pallas
        if use_pallas == "auto":
            # the high-audio-rate tail blocks (C_out <= 192, even stride):
            # one VMEM residency for snake + transposed conv + 3 resunits
            # (ops/pallas_decoder_block.py) instead of ~8 HBM round trips.
            # bf16 is the serving dtype; training (f32) keeps the exact
            # unfused composition (the kernel's VJP recomputes it anyway).
            from edm_tts_tpu.ops.pallas_decoder_block import _HALO

            use_pallas = (
                jax.default_backend() == "tpu"
                and x.dtype == jnp.bfloat16
                and self.stride % 2 == 0
                and _HALO % self.stride == 0  # kernel halo bookkeeping
                and self.output_dim <= 192
            )
        if use_pallas:
            from edm_tts_tpu.ops.pallas_decoder_block import (
                fused_decoder_block,
            )

            alpha0 = snake0(x, return_alpha=True)
            wt, bt = tconv(x, return_folded=True)
            ru = tuple(u(x, return_folded=True) for u in units)
            return fused_decoder_block(x, alpha0, (wt, bt), ru, self.stride)

        x = snake0(x)
        x = tconv(x)
        for u in units:
            x = u(x)
        return x


class Decoder(nn.Module):
    channels: int = 1536
    rates: Sequence[int] = (8, 5, 4, 2)
    d_out: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        """``(B, T50, latent_dim)`` -> ``(B, T50 * prod(rates), d_out)``."""
        x = WNConv1d(self.channels, 7, padding=3, dtype=self.dtype)(z)
        for i, stride in enumerate(self.rates):
            x = DecoderBlock(self.channels // 2 ** (i + 1), stride, dtype=self.dtype)(x)
        x = Snake()(x)
        x = WNConv1d(self.d_out, 7, padding=3, dtype=self.dtype)(x)
        return jnp.tanh(x)
