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


def _zero_invalid(x: Array, boundary: Array | None) -> Array:
    """Zero positions >= per-sample ``boundary`` (time axis -2).

    Used by variable-length batched decoding: zeros beyond the valid region
    reproduce exactly the zero padding an exact-size canvas's convs would
    see, so valid outputs are bit-identical to per-length decoding
    (invalid positions stay garbage and are trimmed by the caller).
    """
    if boundary is None:
        return x
    t = x.shape[-2]
    keep = jnp.arange(t)[None, :] < boundary[:, None]  # (B, T)
    return jnp.where(keep[..., None], x, 0)


class DecoderBlock(nn.Module):
    output_dim: int
    stride: int
    dtype: Any = jnp.float32
    use_pallas: str | bool = "auto"

    @nn.compact
    def __call__(self, x: Array, boundary: Array | None = None) -> Array:
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
        if boundary is not None:
            # variable-length masked path: zeros must be re-imposed between
            # the internal convs, which the fused kernel doesn't do
            use_pallas = False
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

        x = snake0(x)  # snake(0) == 0: no re-mask needed before the tconv
        x = tconv(x)
        if boundary is not None:
            # tconv output boundary: s*v (+2 when s is odd — the kernel
            # overhang the exact canvas keeps, fed by valid inputs only)
            boundary = self.stride * boundary + (2 if self.stride % 2 else 0)
            x = _zero_invalid(x, boundary)
        for u in units:
            x = u(x)
            # the unit's k=7 conv bias leaks into the invalid region; re-zero
            # before the next cross-position conv
            x = _zero_invalid(x, boundary)
        return x


class Decoder(nn.Module):
    channels: int = 1536
    rates: Sequence[int] = (8, 5, 4, 2)
    d_out: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: Array, valid_frames: Array | None = None) -> Array:
        """``(B, T50, latent_dim)`` -> ``(B, T50 * prod(rates), d_out)``.

        ``valid_frames`` (optional, ``(B,)`` int): decode a padded canvas so
        that outputs at valid positions are bit-identical to decoding each
        sample's exact-size canvas — invalid latents are zeroed and zeros are
        re-imposed between conv stages, reproducing the edge padding an
        exact canvas would see (variable-length batched inference; see
        ``_zero_invalid``). Costs a few audio-rate ``where``s and disables
        the fused DecoderBlock kernels.
        """
        boundary = valid_frames
        z = _zero_invalid(z, boundary)
        x = WNConv1d(self.channels, 7, padding=3, dtype=self.dtype)(z)
        x = _zero_invalid(x, boundary)
        for i, stride in enumerate(self.rates):
            x = DecoderBlock(self.channels // 2 ** (i + 1), stride, dtype=self.dtype)(
                x, boundary
            )
            if boundary is not None:
                boundary = stride * boundary + (2 if stride % 2 else 0)
        x = Snake()(x)
        x = WNConv1d(self.d_out, 7, padding=3, dtype=self.dtype)(x)
        return jnp.tanh(x)
