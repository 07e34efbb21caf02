"""Polyphase sinc resampling (torchaudio.functional.resample semantics).

Replaces the torchaudio resampler used by the reference for preprocessing
and the (config-disabled) MSD discriminator (modeling_dac.py:88,
discriminators.py:136-138, audio_loading_utils.py:68). Kernel construction
follows the standard windowed-sinc polyphase design torchaudio uses
(lowpass_filter_width=6, rolloff=0.99, Hann window): after gcd reduction,
one bank of ``new_freq`` phases is built and applied as a strided conv —
which on TPU is exactly an MXU-friendly ``lax.conv_general_dilated`` with
``window_strides=orig_freq``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=32)
def _resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int]:
    """Returns (kernels (new_freq, width), width) after gcd reduction."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig_freq / base_freq))
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t_pi = t * math.pi
    kernel = np.where(t_pi == 0, 1.0, np.sin(t_pi) / np.where(t_pi == 0, 1.0, t_pi))
    kernel = kernel * window * (base_freq / orig_freq)
    return kernel.astype(np.float32), width


def resample(x: Array, orig_freq: int, new_freq: int) -> Array:
    """``(..., T)`` -> resampled ``(..., ceil(T * new/orig))`` (jittable)."""
    if orig_freq == new_freq:
        return x
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = orig_freq // g, new_freq // g
    kernels, width = _resample_kernel(orig, new)
    t = x.shape[-1]
    target_len = int(math.ceil(new * t / orig))
    lead = x.shape[:-1]
    xf = x.reshape(-1, t, 1).astype(jnp.float32)
    # conv with each phase kernel, stride = orig
    k = jnp.asarray(kernels).T[:, None, :]  # (width_total, 1, new)
    y = jax.lax.conv_general_dilated(
        jnp.pad(xf, ((0, 0), (width, width + orig), (0, 0))),
        k,
        window_strides=(orig,),
        padding=((0, 0),),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # (B, T//orig + 1, new)
    y = y.reshape(y.shape[0], -1)[:, :target_len]
    return y.reshape(*lead, target_len)


def resample_numpy(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Host-side wrapper (same kernel) for the data pipeline."""
    if orig_freq == new_freq:
        return np.asarray(x, np.float32)
    return np.asarray(resample(jnp.asarray(x, jnp.float32), orig_freq, new_freq))
