"""Spectral op parity vs torch.stft / known-good references."""

import jax.numpy as jnp
import numpy as np
import torch

from edm_tts_tpu.ops.spectral import (
    hann_window,
    mel_filterbank,
    mel_spectrogram,
    spectrogram,
    stft,
)


def test_stft_matches_torch(rng):
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    n_fft, hop = 512, 128
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop))
    theirs = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy()
    np.testing.assert_allclose(ours.real, theirs.real, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(ours.imag, theirs.imag, atol=1e-3, rtol=1e-3)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        np.asarray(hann_window(256)), torch.hann_window(256).numpy(), atol=1e-6
    )


def test_magnitude_spectrogram_shapes(rng):
    x = rng.standard_normal((1, 1600)).astype(np.float32)
    s = spectrogram(jnp.asarray(x), 512, 128, power=1.0)
    assert s.shape == (1, 257, 1600 // 128 + 1)
    assert (np.asarray(s) >= 0).all()


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 1024, 80)
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # every mel bin integrates some energy; interior freq bins covered
    assert (fb.sum(axis=0) > 0).all()
    # triangle peaks are sorted in frequency
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_mel_spectrogram_sine_peak():
    """A pure tone must put its mel energy at the right frequency bin."""
    sr, f = 16000, 1000.0
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    m = np.asarray(mel_spectrogram(jnp.asarray(x[None]), sr, 1024, 80))
    fb = mel_filterbank(sr, 1024, 80)
    expect_bin = fb[int(round(f * 1024 / sr))].argmax()
    got_bin = m[0].mean(axis=-1).argmax()
    assert abs(int(got_bin) - int(expect_bin)) <= 1
