"""Codec GAN overfit sanity: adversarial steps on a fixed tone batch must
drive the (dominant, lambda=15) mel reconstruction loss down."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.codec.discriminator import Discriminator, DiscriminatorConfig
from edm_tts_tpu.models.codec.losses import ReconstructionLoss
from edm_tts_tpu.train.gan import TrainState, gan_train_step
from edm_tts_tpu.train.optim import adamw, exponential_schedule


@pytest.mark.slow
def test_codec_gan_overfits_tone():
    codec = Codec(CodecConfig(encoder_dim=4, decoder_dim=32, n_codebooks=2,
                              codebook_size=16, codebook_dim=4,
                              quantizer_dropout=0.0))
    disc = Discriminator(DiscriminatorConfig(periods=(2,), fft_sizes=(128,)))
    t = np.arange(640) / 16000
    audio = jnp.asarray(
        (0.4 * np.sin(2 * np.pi * 440 * t))[None, :, None], jnp.float32
    ).repeat(2, axis=0)
    g_params = jax.jit(codec.init)(jax.random.PRNGKey(0), audio)
    d_params = jax.jit(disc.init)(jax.random.PRNGKey(1), audio)
    recon = ReconstructionLoss(
        16000,
        mel_spectrogram_args={
            "n_mels": (5, 10), "window_lengths": (64, 128),
            "mel_fmin": (0.0, 0.0), "mel_fmax": (None, None),
        },
    )
    tx = adamw(exponential_schedule(5e-4, 1.0), b1=0.8, b2=0.99)
    g_state = TrainState.create(apply_fn=None, params=g_params, tx=tx)
    d_state = TrainState.create(apply_fn=None, params=d_params, tx=tx)

    first = None
    for i in range(40):
        g_state, d_state, m = gan_train_step(
            codec, disc, recon, g_state, d_state, audio,
            jax.random.PRNGKey(10 + i),
        )
        mel = float(m["mel/loss"])
        if first is None:
            first = mel
    assert mel < 0.7 * first, (first, mel)
    assert np.isfinite(float(m["adv/disc_loss"]))
