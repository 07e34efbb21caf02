"""Differential parity: codec training losses vs the actual reference
``dac_loss.py`` modules (L1 / SISDR / MultiScaleSTFT / MelSpectrogram /
ReconstructionLoss / GANLoss), run side by side on the same random audio.

The torchaudio transforms the reference needs are provided by faithful
torch.stft-based stand-ins (reference_torch.py); everything under test —
scale lists, clamp/pow/log10/L1 composition, loss weighting, fmap traversal —
is the reference's own code. The GANLoss case runs the reference
DACDiscriminator on torch and our converted flax Discriminator on jax, so
the adversarial + feature-matching losses are compared through the real
discriminator stacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edm_tts_tpu.models.codec import losses as L
from edm_tts_tpu.models.codec.convert import discriminator_from_torch_state_dict
from edm_tts_tpu.models.codec.discriminator import Discriminator, DiscriminatorConfig
from reference_torch import install_reference_path

install_reference_path()

from edm_tts.models.dac import dac_loss as ref_loss  # noqa: E402
from edm_tts.models.dac.discriminators import (  # noqa: E402
    DACDiscriminator,
    DACDiscriminatorConfig,
)

# the training recipe's mel args (/root/reference/configs/dac/train_config.yaml:53-60)
MEL_ARGS = dict(
    n_mels=[5, 10, 20, 40, 80, 160, 320],
    window_lengths=[32, 64, 128, 256, 512, 1024, 2048],
    mel_fmin=[0.0] * 7,
    mel_fmax=[None] * 7,
    power=1.0,
    clamp_eps=1e-5,
    mag_weight=0.0,
)


@pytest.fixture(scope="module")
def audio_pair():
    rng = np.random.default_rng(7)
    x = (0.4 * rng.standard_normal((2, 6080))).astype(np.float32)
    y = (x + 0.05 * rng.standard_normal((2, 6080))).astype(np.float32)
    return x, y


def test_waveform_l1_parity(audio_pair):
    x, y = audio_pair
    ref = ref_loss.L1Loss()(torch.from_numpy(x), torch.from_numpy(y)).item()
    mine = float(L.waveform_l1_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(mine, ref, rtol=1e-5)


def test_sisdr_parity(audio_pair):
    x, y = audio_pair
    ref = ref_loss.SISDRLoss()(torch.from_numpy(x), torch.from_numpy(y)).item()
    mine = float(L.sisdr_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(mine, ref, rtol=1e-4)


def test_multi_scale_stft_parity(audio_pair):
    x, y = audio_pair
    ref = ref_loss.MultiScaleSTFTLoss()(
        torch.from_numpy(x), torch.from_numpy(y)
    ).item()
    mine = float(L.multi_scale_stft_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(mine, ref, rtol=1e-4)


def test_multi_scale_mel_parity(audio_pair):
    """The recipe's 7-scale mel loss, including the torchaudio
    MelSpectrogram default power=2.0 (mel of the POWER spectrogram —
    dac_loss.py:259-268 passes no ``power``); the YAML's ``power: 1.0`` is
    the pre-log exponent, a separate knob."""
    x, y = audio_pair
    ref = ref_loss.MelSpectrogramLoss(sample_rate=16000, **MEL_ARGS)(
        torch.from_numpy(x), torch.from_numpy(y)
    ).item()
    mine = float(
        L.multi_scale_mel_loss(
            jnp.asarray(x),
            jnp.asarray(y),
            sample_rate=16000,
            n_mels=tuple(MEL_ARGS["n_mels"]),
            window_lengths=tuple(MEL_ARGS["window_lengths"]),
            mel_fmin=tuple(MEL_ARGS["mel_fmin"]),
            mel_fmax=tuple(MEL_ARGS["mel_fmax"]),
            power=MEL_ARGS["power"],
            clamp_eps=MEL_ARGS["clamp_eps"],
            mag_weight=MEL_ARGS["mag_weight"],
        )
    )
    np.testing.assert_allclose(mine, ref, rtol=1e-3)


def test_reconstruction_loss_parity(audio_pair):
    x, y = audio_pair
    ref = ref_loss.ReconstructionLoss(
        sample_rate=16000,
        waveform_args={},
        multi_scale_stft_args={},
        mel_spectrogram_args=MEL_ARGS,
    )(torch.from_numpy(x), torch.from_numpy(y))
    mine = L.ReconstructionLoss(
        sample_rate=16000,
        waveform_args={},
        multi_scale_stft_args={},
        mel_spectrogram_args=MEL_ARGS,
    )(jnp.asarray(x), jnp.asarray(y))
    assert set(mine) == set(ref.keys())
    for k in ref:
        np.testing.assert_allclose(
            float(mine[k]), ref[k].item(), rtol=2e-3, err_msg=k
        )


def test_gan_loss_parity(audio_pair):
    """LSGAN disc/gen losses + L1 feature matching through the real
    discriminator stacks on both sides (dac_loss.py:358-384)."""
    fake, real = audio_pair
    torch.manual_seed(3)
    ref_disc = DACDiscriminator(
        DACDiscriminatorConfig(
            periods=[2, 3], rates=[], fft_sizes=[512], sample_rate=16000
        )
    ).eval()
    cfg = DiscriminatorConfig(
        sample_rate=16000, periods=(2, 3), rates=(), fft_sizes=(512,)
    )
    model = Discriminator(cfg)
    variables = jax.tree.map(
        jnp.asarray, discriminator_from_torch_state_dict(cfg, ref_disc.state_dict())
    )

    gan = ref_loss.GANLoss(ref_disc)
    with torch.no_grad():
        ref_d = gan.discriminator_loss(
            torch.from_numpy(fake)[:, None, :], torch.from_numpy(real)[:, None, :]
        )["adv/disc_loss"].item()
        ref_g, ref_feat = gan.generator_loss(
            torch.from_numpy(fake)[:, None, :], torch.from_numpy(real)[:, None, :]
        )

    apply = jax.jit(lambda v, a: model.apply(v, a))
    d_fake = apply(variables, jnp.asarray(fake)[:, :, None])
    d_real = apply(variables, jnp.asarray(real)[:, :, None])
    mine_d = float(L.discriminator_loss(d_fake, d_real))
    mine_g, mine_feat = L.generator_adversarial_losses(d_fake, d_real)

    np.testing.assert_allclose(mine_d, ref_d, rtol=1e-3)
    np.testing.assert_allclose(float(mine_g), ref_g.item(), rtol=1e-3)
    np.testing.assert_allclose(float(mine_feat), ref_feat.item(), rtol=1e-3)
