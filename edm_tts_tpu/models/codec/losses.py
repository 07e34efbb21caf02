"""Codec training losses: multi-scale mel/STFT, waveform, SI-SDR, LSGAN.

Functional (stateless) re-design of the reference loss modules
(/root/reference/edm_tts/models/dac/dac_loss.py) on XLA FFT:

- multi-scale mel loss: 7 scales (n_mels 5..320, windows 32..2048), log-L1
  with clamp eps 1e-5, power 1.0, mag_weight 0 (train YAML
  configs/dac/train_config.yaml:53-60);
- multi-scale STFT loss (window list, log + mag L1);
- LSGAN: disc ``E[D(fake)^2] + E[(1-D(real))^2]``, gen ``E[(1-D(fake))^2]``
  plus L1 feature matching over every fmap layer (dac_loss.py:358-384).

All spectra are computed batched over scales where shapes allow; f32.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from edm_tts_tpu.ops.spectral import mel_spectrogram, spectrogram

Array = jax.Array


def l1(x: Array, y: Array) -> Array:
    return jnp.mean(jnp.abs(x - y))


def waveform_l1_loss(x: Array, y: Array) -> Array:
    """Plain L1 between waveforms (reference L1Loss)."""
    return l1(x, y)


def multi_scale_stft_loss(
    x: Array,
    y: Array,
    *,
    window_lengths: Sequence[int] = (2048, 512),
    clamp_eps: float = 1e-5,
    mag_weight: float = 1.0,
    log_weight: float = 1.0,
    power: float = 2.0,
) -> Array:
    """Sum over scales of log-magnitude L1 + magnitude L1 (dac_loss.py:128-204)."""
    x = jnp.squeeze(x, -1) if x.shape[-1] == 1 else x
    y = jnp.squeeze(y, -1) if y.shape[-1] == 1 else y
    loss = 0.0
    for w in window_lengths:
        xm = spectrogram(x, w, w // 4, power=1.0)
        ym = spectrogram(y, w, w // 4, power=1.0)
        loss += log_weight * l1(
            jnp.log10(jnp.maximum(xm, clamp_eps) ** power),
            jnp.log10(jnp.maximum(ym, clamp_eps) ** power),
        )
        loss += mag_weight * l1(xm, ym)
    return loss


def multi_scale_mel_loss(
    x: Array,
    y: Array,
    *,
    sample_rate: int,
    n_mels: Sequence[int] = (5, 10, 20, 40, 80, 160, 320),
    window_lengths: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048),
    mel_fmin: Sequence[float] = (0.0,) * 7,
    mel_fmax: Sequence[float | None] = (None,) * 7,
    clamp_eps: float = 1e-5,
    mag_weight: float = 0.0,
    log_weight: float = 1.0,
    power: float = 1.0,
) -> Array:
    """Multi-scale mel distance (dac_loss.py:207-292; YAML defaults).

    The mels are of the POWER spectrogram: the reference constructs
    ``torchaudio.transforms.MelSpectrogram`` without a ``power`` argument
    (dac_loss.py:259-268), so torchaudio's default 2.0 applies. The
    ``power`` parameter here is a different knob — the pre-log10 exponent
    from the train YAML (1.0) — and does NOT feed the spectrogram.
    Verified differentially in tests/test_convert_losses.py.
    """
    x = jnp.squeeze(x, -1) if x.shape[-1] == 1 else x
    y = jnp.squeeze(y, -1) if y.shape[-1] == 1 else y
    loss = 0.0
    for w, m, lo, hi in zip(window_lengths, n_mels, mel_fmin, mel_fmax):
        xm = mel_spectrogram(x, sample_rate, w, m, w // 4, fmin=lo, fmax=hi, power=2.0)
        ym = mel_spectrogram(y, sample_rate, w, m, w // 4, fmin=lo, fmax=hi, power=2.0)
        loss += log_weight * l1(
            jnp.log10(jnp.maximum(xm, clamp_eps) ** power),
            jnp.log10(jnp.maximum(ym, clamp_eps) ** power),
        )
        loss += mag_weight * l1(xm, ym)
    return loss


def sisdr_loss(
    references: Array,
    estimates: Array,
    *,
    scaling: bool = True,
    zero_mean: bool = True,
    clip_min: float | None = None,
) -> Array:
    """Negative scale-invariant SDR (dac_loss.py:41-125). ``(B, T, 1)`` in."""
    eps = 1e-8
    r = references.reshape(references.shape[0], -1).astype(jnp.float32)
    e = estimates.reshape(estimates.shape[0], -1).astype(jnp.float32)
    if zero_mean:
        r = r - jnp.mean(r, axis=-1, keepdims=True)
        e = e - jnp.mean(e, axis=-1, keepdims=True)
    r_proj = jnp.sum(r * r, axis=-1) + eps
    r_on_e = jnp.sum(e * r, axis=-1) + eps
    scale = (r_on_e / r_proj)[:, None] if scaling else 1.0
    e_true = scale * r
    e_res = e - e_true
    signal = jnp.sum(e_true**2, axis=-1)
    noise = jnp.sum(e_res**2, axis=-1)
    sdr = -10.0 * jnp.log10(signal / noise + eps)
    if clip_min is not None:
        sdr = jnp.maximum(sdr, clip_min)
    return jnp.mean(sdr)


class ReconstructionLoss:
    """Aggregates the configured reconstruction terms (dac_loss.py:307-327)."""

    def __init__(
        self,
        sample_rate: int,
        waveform_args: dict | None = None,
        multi_scale_stft_args: dict | None = None,
        mel_spectrogram_args: dict | None = None,
    ):
        self.sample_rate = sample_rate
        self.waveform_args = waveform_args
        self.stft_args = multi_scale_stft_args
        self.mel_args = self._map_mel_args(mel_spectrogram_args or {})

    @staticmethod
    def _map_mel_args(args: dict) -> dict:
        args = dict(args)
        args.pop("weight", None)
        if "pow" in args:
            args["power"] = args.pop("pow")
        return args

    def __call__(self, x: Array, y: Array) -> dict[str, Array]:
        out = {}
        if self.waveform_args is not None:
            out["waveform/loss"] = waveform_l1_loss(x, y)
        if self.stft_args is not None:
            stft_args = {k: v for k, v in self.stft_args.items() if k != "weight"}
            out["stft/loss"] = multi_scale_stft_loss(x, y, **stft_args)
        mel_args = {
            k: tuple(v) if isinstance(v, list) else v for k, v in self.mel_args.items()
        }
        out["mel/loss"] = multi_scale_mel_loss(
            x, y, sample_rate=self.sample_rate, **mel_args
        )
        return out


# -- GAN losses (take fmap lists from the discriminator ensemble) -----------

FMaps = Sequence[Sequence[Array]]


def discriminator_loss(d_fake: FMaps, d_real: FMaps) -> Array:
    """LSGAN discriminator objective over the last fmap of each disc."""
    loss = 0.0
    for f, r in zip(d_fake, d_real):
        loss += jnp.mean(jnp.square(f[-1].astype(jnp.float32)))
        loss += jnp.mean(jnp.square(1.0 - r[-1].astype(jnp.float32)))
    return loss


def generator_adversarial_losses(d_fake: FMaps, d_real: FMaps) -> tuple[Array, Array]:
    """(gen LSGAN loss, L1 feature-matching over all non-final fmaps)."""
    loss_g = 0.0
    for f in d_fake:
        loss_g += jnp.mean(jnp.square(1.0 - f[-1].astype(jnp.float32)))
    loss_feat = 0.0
    for f_list, r_list in zip(d_fake, d_real):
        for f, r in zip(f_list[:-1], r_list[:-1]):
            loss_feat += l1(f.astype(jnp.float32), jax.lax.stop_gradient(r).astype(jnp.float32))
    return loss_g, loss_feat
