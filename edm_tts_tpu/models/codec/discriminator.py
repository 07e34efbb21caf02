"""GAN discriminator ensemble: MPD (period-folded 2D), MRD (multi-band
complex STFT 2D), MSD (resampled 1D; disabled by default config).

Re-design of /root/reference/edm_tts/models/dac/discriminators.py for TPU:
channel-last NHWC convs (XLA:TPU's native 2D conv layout), STFT on XLA FFT
(ops/spectral.py), weight-norm as explicit reparameterization. Structure and
all shape/padding arithmetic match the reference:

- MPD x5 (periods 2,3,5,7,11): reflect-pad T to a period multiple, fold to
  (L/p, p), 2D convs k=(5,1) s=(3,1) (:82-117);
- MRD x3 (n_fft 2048/1024/512): match-stride reflect padding, complex
  spectrogram trimmed by 2 frames each side, 5 frequency bands, per-band
  (3,9) conv stacks with stride (1,2) over frequency (:157-224);
- input conditioning: DC removal + 0.8 peak normalization (:280-283);
- every conv is weight-normed and LeakyReLU(0.1) except the posts.

Returns, per discriminator, the list of feature maps (last = logits map).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from edm_tts_tpu.ops.spectral import stft

Array = jax.Array

BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    sample_rate: int = 16000
    rates: Tuple[int, ...] = ()
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512)
    bands: Tuple[Tuple[float, float], ...] = BANDS

    @classmethod
    def from_dict(cls, d: dict) -> "DiscriminatorConfig":
        d = {k: v for k, v in d.items() if k in {f.name for f in dataclasses.fields(cls)}}
        for k in ("rates", "periods", "fft_sizes"):
            if k in d:
                d[k] = tuple(d[k])
        if "bands" in d:
            d["bands"] = tuple(tuple(b) for b in d["bands"])
        return cls(**d)


def _uniform_init(fan_in: int):
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class WNConv2d(nn.Module):
    """Weight-normalized NHWC 2D conv, optional LeakyReLU(0.1)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        fan_in = cin * kh * kw
        v = self.param("v", _uniform_init(fan_in), (kh, kw, cin, self.features))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True))
        g = self.param(
            "g", lambda k, _: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2))), None
        )
        kernel = (v * (g / norm)).astype(self.dtype)
        b = self.param("b", _uniform_init(fan_in), (self.features,))
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=self.strides,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(self.dtype)
        if self.act:
            y = jax.nn.leaky_relu(y, 0.1)
        return y


class WNConv1dDisc(nn.Module):
    """Weight-normalized channel-last 1D conv with groups (MSD stack)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        fan_in = (cin // self.groups) * self.kernel_size
        v = self.param(
            "v", _uniform_init(fan_in),
            (self.kernel_size, cin // self.groups, self.features),
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
        g = self.param(
            "g", lambda k, _: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1))), None
        )
        kernel = (v * (g / norm)).astype(self.dtype)
        b = self.param("b", _uniform_init(fan_in), (self.features,))
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        ) + b.astype(self.dtype)
        if self.act:
            y = jax.nn.leaky_relu(y, 0.1)
        return y


class MPD(nn.Module):
    """Multi-period discriminator: fold audio by ``period``, 2D convs."""

    period: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        # x: (B, T, 1) -> reflect-pad to a period multiple (reference pads a
        # full extra period when already aligned, :99-102 — preserved)
        b, t, _ = x.shape
        pad = self.period - t % self.period
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        x = x.reshape(b, -1, self.period, 1)  # (B, L, P, C)

        fmap = []
        chans = [32, 128, 512, 1024, 1024]
        strides = [(3, 1)] * 4 + [(1, 1)]
        for c, s in zip(chans, strides):
            x = WNConv2d(c, (5, 1), s, (2, 0), dtype=self.dtype)(x)
            fmap.append(x)
        x = WNConv2d(1, (3, 1), (1, 1), (1, 0), act=False, dtype=self.dtype)(x)
        fmap.append(x)
        return fmap


class MRD(nn.Module):
    """Multi-resolution complex-spectrogram discriminator, 5 freq bands."""

    window_length: int
    hop_factor: float = 0.25
    sample_rate: int = 16000
    bands: Sequence[Tuple[float, float]] = BANDS
    dtype: Any = jnp.float32

    def spectrogram_bands(self, x: Array) -> list[Array]:
        """(B, T, 1) -> list of (B, T', F_band, 2) real/imag band slices."""
        w = self.window_length
        hop = int(w * self.hop_factor)
        sig = x[..., 0]
        # match-stride padding (reference pad_signal_for_stft:14-50)
        length = sig.shape[-1]
        right_pad = math.ceil(length / hop) * hop - length
        pad = (w - hop) // 2
        sig = jnp.pad(sig, ((0, 0), (pad, right_pad)), mode="reflect")
        spec = stft(sig, w, hop)  # (B, F, T') complex, center=True
        spec = spec[..., 2:-2]
        ri = jnp.stack([spec.real, spec.imag], axis=-1)  # (B, F, T', 2)
        ri = jnp.swapaxes(ri, 1, 2)  # (B, T', F, 2)
        n_fft = w // 2 + 1
        bands = [(int(lo * n_fft), int(hi * n_fft)) for lo, hi in self.bands]
        return [ri[:, :, lo:hi, :] for lo, hi in bands]

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        ch = 32
        x_bands = self.spectrogram_bands(x)
        fmap = []
        outs = []
        for bi, band in enumerate(x_bands):
            h = band
            specs = [
                (ch, (3, 9), (1, 1), (1, 4)),
                (ch, (3, 9), (1, 2), (1, 4)),
                (ch, (3, 9), (1, 2), (1, 4)),
                (ch, (3, 9), (1, 2), (1, 4)),
                (ch, (3, 3), (1, 1), (1, 1)),
            ]
            for li, (c, k, s, p) in enumerate(specs):
                h = WNConv2d(c, k, s, p, dtype=self.dtype,
                             name=f"band{bi}_conv{li}")(h)
                fmap.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)  # concat over frequency
        h = WNConv2d(1, (3, 3), (1, 1), (1, 1), act=False, dtype=self.dtype,
                     name="conv_post")(h)
        fmap.append(h)
        return fmap


class MSD(nn.Module):
    """Multi-scale (resampled) 1D discriminator. Off by default config
    (rates: [] in configs/dac/train_config.yaml:20) but provided for parity."""

    rate: int = 1
    sample_rate: int = 16000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        from edm_tts_tpu.ops.resample import resample

        if self.rate > 1:
            x = resample(
                x[..., 0], self.sample_rate, self.sample_rate // self.rate
            )[..., None]
        fmap = []
        specs = [
            (16, 15, 1, 7, 1),
            (64, 41, 4, 20, 4),
            (256, 41, 4, 20, 16),
            (1024, 41, 4, 20, 64),
            (1024, 41, 4, 20, 256),
            (1024, 5, 1, 2, 1),
        ]
        h = x
        for c, k, s, p, g in specs:
            h = WNConv1dDisc(c, k, s, p, groups=g, dtype=self.dtype)(h)
            fmap.append(h)
        h = WNConv1dDisc(1, 3, 1, 1, act=False, dtype=self.dtype)(h)
        fmap.append(h)
        return fmap


class Discriminator(nn.Module):
    """The full ensemble (reference DACDiscriminator:256-287)."""

    config: DiscriminatorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> list[list[Array]]:
        """``(B, T, 1)`` waveform -> list of per-discriminator fmap lists."""
        x = x - jnp.mean(x, axis=1, keepdims=True)
        peak = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        x = 0.8 * x / (peak + 1e-9)

        fmaps = []
        for p in self.config.periods:
            fmaps.append(MPD(p, dtype=self.dtype, name=f"mpd_{p}")(x))
        for r in self.config.rates:
            fmaps.append(
                MSD(r, self.config.sample_rate, dtype=self.dtype, name=f"msd_{r}")(x)
            )
        for f in self.config.fft_sizes:
            fmaps.append(
                MRD(f, sample_rate=self.config.sample_rate,
                    bands=self.config.bands, dtype=self.dtype, name=f"mrd_{f}")(x)
            )
        return fmaps
