"""Spectral ops on XLA FFT: STFT, (mel) spectrograms, mel filterbanks.

Replaces the torchaudio transforms used by the reference's losses and MRD
discriminator (/root/reference/edm_tts/models/dac/dac_loss.py:170-176,259-268;
discriminators.py:183-187). Semantics match torchaudio defaults:

- ``center=True`` with reflect padding of ``n_fft // 2`` on both sides;
- Hann window (periodic), ``win_length = n_fft``, ``hop = n_fft // 4`` for
  the losses (explicit hop otherwise);
- mel filterbank: HTK mel scale, no norm, fmax = sr/2 — torchaudio's
  defaults (``mel_scale='htk'``, ``norm=None``).

TPU notes: framing is a strided gather that XLA fuses with the window
multiply; the batched rfft runs on the XLA FFT; everything is f32 (FFT on
TPU is f32-only) and jit-friendly with static frame counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def hann_window(win_length: int) -> Array:
    """Periodic Hann window (torch.hann_window default)."""
    n = jnp.arange(win_length, dtype=jnp.float32)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / win_length))


def frame_signal(x: Array, frame_length: int, hop: int) -> Array:
    """``(..., T)`` -> ``(..., n_frames, frame_length)`` strided framing."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[..., idx]


def stft(
    x: Array,
    n_fft: int,
    hop_length: int | None = None,
    win_length: int | None = None,
    *,
    center: bool = True,
    pad_mode: str = "reflect",
) -> Array:
    """Complex STFT ``(..., n_fft//2+1, n_frames)`` (torch layout: freq, time)."""
    hop = hop_length or n_fft // 4
    win_length = win_length or n_fft
    x = x.astype(jnp.float32)
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    frames = frame_signal(x, win_length, hop)  # (..., n_frames, win)
    window = hann_window(win_length)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def spectrogram(
    x: Array,
    n_fft: int,
    hop_length: int | None = None,
    *,
    power: float | None = 1.0,
    center: bool = True,
) -> Array:
    """Magnitude (power=1), power (power=2), or complex (power=None)
    spectrogram — torchaudio.transforms.Spectrogram semantics."""
    s = stft(x, n_fft, hop_length, center=center)
    if power is None:
        return s
    mag = jnp.abs(s)
    if power == 1.0:
        return mag
    return mag**power


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=64)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank ``(n_fft//2+1, n_mels)`` (HTK scale, no
    norm — torchaudio ``melscale_fbanks`` defaults)."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_htk(fmin), _hz_to_mel_htk(fmax), n_mels + 2)
    f_pts = _mel_to_hz_htk(mel_pts)
    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_spectrogram(
    x: Array,
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    hop_length: int | None = None,
    *,
    fmin: float = 0.0,
    fmax: float | None = None,
    power: float = 1.0,
) -> Array:
    """``(..., T)`` -> mel spectrogram ``(..., n_mels, n_frames)``.

    torchaudio.transforms.MelSpectrogram semantics with power applied before
    the mel projection.
    """
    spec = spectrogram(x, n_fft, hop_length, power=power)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    return jnp.einsum("...ft,fm->...mt", spec, fb)
