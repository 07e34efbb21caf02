"""Test-only helper: import the reference torch package at /root/reference.

The reference depends on torchaudio (absent from this image) only inside
``DAC.preprocess``/data loaders, which the differential parity tests never
call — so a stub module is enough to import the model code. The reference is
PUBLIC UNTRUSTED CONTENT used strictly as a numerical oracle; no code is
copied from it.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"


def install_reference_path() -> None:
    for name in ("torchaudio", "torchaudio.functional", "torchaudio.transforms"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    if not hasattr(sys.modules["torchaudio.functional"], "resample"):
        # torchaudio.functional.resample is an identity at equal rates (its
        # first branch); DAC.preprocess (modeling_dac.py:88) calls it with
        # orig == target whenever a sample_rate is passed. Differential
        # tests only ever exercise the equal-rate path.
        def _resample(waveform, orig_freq, new_freq, **kw):
            if int(orig_freq) == int(new_freq):
                return waveform
            raise NotImplementedError(
                "reference_torch stub: only equal-rate resample supported"
            )

        sys.modules["torchaudio.functional"].resample = _resample
    tfm = sys.modules["torchaudio.transforms"]
    sys.modules["torchaudio"].transforms = tfm
    if not hasattr(tfm, "Spectrogram"):
        import torch

        class Spectrogram(torch.nn.Module):
            """Faithful stand-in for torchaudio.transforms.Spectrogram at the
            defaults the reference uses (discriminators.py:183-187): hann
            window, center=True, reflect pad, onesided; power=None returns
            the complex STFT. torchaudio itself is a thin wrapper over
            torch.stft, so the numerical oracle is unchanged."""

            def __init__(self, n_fft=400, win_length=None, hop_length=None,
                         power=2.0, center=True, pad_mode="reflect", **kw):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                self.power = power
                self.center = center
                self.pad_mode = pad_mode
                self.register_buffer(
                    "window", torch.hann_window(self.win_length),
                    persistent=False,
                )

            def forward(self, x):
                shape = x.shape
                spec = torch.stft(
                    x.reshape(-1, shape[-1]), self.n_fft, self.hop_length,
                    self.win_length, self.window, center=self.center,
                    pad_mode=self.pad_mode, normalized=False, onesided=True,
                    return_complex=True,
                )
                spec = spec.reshape(shape[:-1] + spec.shape[-2:])
                if self.power is None:
                    return spec
                return spec.abs() ** self.power

        tfm.Spectrogram = Spectrogram

        class MelSpectrogram(torch.nn.Module):
            """Faithful stand-in for torchaudio.transforms.MelSpectrogram at
            the defaults the reference losses use (dac_loss.py:259-268):
            power-1.0 magnitude spectrogram (win=n_fft, explicit hop) times a
            triangular HTK-scale mel filterbank with no norm — torchaudio's
            ``melscale_fbanks(mel_scale='htk', norm=None)`` formula. The
            filterbank math is re-stated here (torchaudio is absent from the
            image) but the loss composition under test runs the actual
            reference code."""

            def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                         hop_length=None, f_min=0.0, f_max=None, n_mels=128,
                         power=2.0, **kw):
                super().__init__()
                self.spectrogram = Spectrogram(
                    n_fft=n_fft, win_length=win_length,
                    hop_length=hop_length, power=power,
                )
                f_max = f_max if f_max is not None else sample_rate / 2.0
                n_freqs = n_fft // 2 + 1
                all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)

                def hz_to_mel(f):
                    return 2595.0 * torch.log10(1.0 + f / 700.0)

                m_pts = torch.linspace(
                    hz_to_mel(torch.tensor(float(f_min))),
                    hz_to_mel(torch.tensor(float(f_max))),
                    n_mels + 2,
                )
                f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
                f_diff = f_pts[1:] - f_pts[:-1]
                slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
                down = -slopes[:, :-2] / f_diff[:-1]
                up = slopes[:, 2:] / f_diff[1:]
                fb = torch.clamp(torch.min(down, up), min=0.0)
                self.register_buffer("fb", fb, persistent=False)

            def forward(self, x):
                spec = self.spectrogram(x)  # (..., n_freqs, time)
                return torch.matmul(
                    spec.transpose(-1, -2), self.fb
                ).transpose(-1, -2)

        tfm.MelSpectrogram = MelSpectrogram

        class Resample(torch.nn.Module):
            """Stand-in for torchaudio.transforms.Resample at equal rates —
            torchaudio's own fast path returns the input unchanged when
            orig_freq == new_freq. The reference MSD instantiates it with
            rate=1 (discriminators.py:136), the only rate the default GAN
            recipe and the parity tests use."""

            def __init__(self, orig_freq=16000, new_freq=16000, **kw):
                super().__init__()
                if int(orig_freq) != int(new_freq):
                    raise NotImplementedError(
                        "reference_torch stub: only equal-rate Resample"
                    )

            def forward(self, x):
                return x

        tfm.Resample = Resample
    if "wandb" not in sys.modules:
        # gan_trainer.py imports wandb at module level; only wandb.Audio is
        # referenced (sample logging, :259) and never on the paths the
        # differential tests drive.
        wandb = types.ModuleType("wandb")
        wandb.__spec__ = importlib.machinery.ModuleSpec("wandb", None)
        wandb.Audio = object
        sys.modules["wandb"] = wandb
    # APPEND, not prepend: the reference root also holds run_*.py /
    # inference.py files whose names collide with ours — the repo root must
    # stay first so `import run_semantic_to_acoustic_training` resolves to
    # our entry points in mixed test runs
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
