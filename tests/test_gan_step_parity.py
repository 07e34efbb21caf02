"""Differential parity of the FULL codec GAN training step: the reference
``GANTrainer.train_step`` itself (gan_trainer.py:116-163 — G forward, D loss
backward + D AdamW step + ExponentialLR, recon + adversarial losses against
the updated D, weighted sum, G AdamW step + ExponentialLR) vs our single
jitted ``gan_train_step`` (train/gan.py), on converted weights and identical
audio batches.

Two consecutive steps are compared: step-2 metrics depend on step-1's
updated G AND D parameters on each side, so any mismatch in loss
composition, update sequencing (D updated before the generator's
adversarial loss), optimizer semantics, or per-batch LR scheduling shows up
here. The reference trainer is instantiated for real (CPU accelerate,
single process, no trackers) so the code path under test is its own.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import TrainingArguments as HFTrainingArguments

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.codec import losses as L
from edm_tts_tpu.models.codec.convert import (
    discriminator_from_torch_state_dict,
    from_torch_state_dict,
)
from edm_tts_tpu.models.codec.discriminator import (
    Discriminator,
    DiscriminatorConfig,
)
from edm_tts_tpu.train.gan import DEFAULT_LAMBDAS, TrainState, gan_train_step
from edm_tts_tpu.train.optim import adamw, exponential_schedule
from reference_torch import install_reference_path

install_reference_path()

from edm_tts.models.dac import dac_loss as ref_loss  # noqa: E402
from edm_tts.models.dac.configuration import DACConfig  # noqa: E402
from edm_tts.models.dac.discriminators import (  # noqa: E402
    DACDiscriminator,
    DACDiscriminatorConfig,
)
from edm_tts.models.dac.modeling_dac import DAC  # noqa: E402
from edm_tts.trainers.gan_trainer import GANTrainer  # noqa: E402

TINY = dict(
    encoder_dim=8,
    encoder_rates=[2, 4, 5, 8],
    decoder_dim=96,
    decoder_rates=[8, 5, 4, 2],
    n_codebooks=3,
    codebook_size=16,
    codebook_dim=4,
    quantizer_dropout=0.0,
)
MEL_ARGS = dict(
    n_mels=[5, 10, 20, 40],
    window_lengths=[32, 128, 512, 2048],
    mel_fmin=[0.0] * 4,
    mel_fmax=[None] * 4,
    power=1.0,
    clamp_eps=1e-5,
    mag_weight=0.0,
)
LR, GAMMA = 1e-4, 0.999996
# 0.38 s crop = 6080 samples = 19 hops, the recipe's training shape
B, T = 2, 6080

METRIC_KEYS = [
    "adv/disc_loss",
    "mel/loss",
    "adv/gen_loss",
    "adv/feat_loss",
    "vq/commitment_loss",
    "vq/codebook_loss",
    "loss",
]


def _batches():
    rng = np.random.default_rng(11)
    return [
        (0.4 * rng.standard_normal((B, T))).astype(np.float32) for _ in range(2)
    ]


@pytest.fixture(scope="module")
def reference_metrics(tmp_path_factory):
    torch.manual_seed(1)
    gen = DAC(DACConfig(**TINY))
    disc = DACDiscriminator(
        DACDiscriminatorConfig(
            periods=[2, 3], rates=[], fft_sizes=[512], sample_rate=16000
        )
    )
    gen_sd = {k: v.clone() for k, v in gen.state_dict().items()}
    disc_sd = {k: v.clone() for k, v in disc.state_dict().items()}

    opt_g = torch.optim.AdamW(gen.parameters(), lr=LR, betas=(0.8, 0.99))
    opt_d = torch.optim.AdamW(disc.parameters(), lr=LR, betas=(0.8, 0.99))
    sched_g = torch.optim.lr_scheduler.ExponentialLR(opt_g, gamma=GAMMA)
    sched_d = torch.optim.lr_scheduler.ExponentialLR(opt_d, gamma=GAMMA)
    gan_loss = ref_loss.GANLoss()
    gan_loss.set_discriminator(disc)
    recon = ref_loss.ReconstructionLoss(
        sample_rate=16000,
        waveform_args={},
        multi_scale_stft_args={},
        mel_spectrogram_args=MEL_ARGS,
    )

    dummy = [
        {"audio": torch.zeros(1, T), "sample_rate": torch.tensor(16000)}
        for _ in range(2)
    ]
    args = HFTrainingArguments(
        output_dir=str(tmp_path_factory.mktemp("gan_ref")),
        report_to=[],
        per_device_train_batch_size=B,
        per_device_eval_batch_size=B,
        dataloader_num_workers=0,
        use_cpu=True,
        seed=0,
    )
    trainer = GANTrainer(
        training_args=args,
        model_generator=gen,
        optimizer_generator=opt_g,
        reconstruction_criterion=recon,
        scheduler_generator=sched_g,
        model_discriminator=disc,
        optimizer_discriminator=opt_d,
        gan_criterion=gan_loss,
        scheduler_discriminator=sched_d,
        loss_lambdas=dict(DEFAULT_LAMBDAS),
        train_dataset=dummy,
        collate_fn=None,
        num_batches_per_epoch=1,
        num_samples_to_log=0,
        sample_rate=16000,
        eval_dataset=dummy,
    )

    steps = []
    for audio in _batches():
        batch = {
            "audio": torch.from_numpy(audio)[:, None, :],
            "sample_rate": torch.tensor([16000] * B),
        }
        out = trainer.train_step(batch)
        steps.append({k: out[k].item() for k in METRIC_KEYS})
    return gen_sd, disc_sd, steps


def test_gan_train_step_two_step_parity(reference_metrics):
    gen_sd, disc_sd, ref_steps = reference_metrics

    codec_cfg = CodecConfig(
        encoder_dim=TINY["encoder_dim"],
        encoder_rates=tuple(TINY["encoder_rates"]),
        decoder_dim=TINY["decoder_dim"],
        decoder_rates=tuple(TINY["decoder_rates"]),
        n_codebooks=TINY["n_codebooks"],
        codebook_size=TINY["codebook_size"],
        codebook_dim=TINY["codebook_dim"],
        quantizer_dropout=0.0,
    )
    codec = Codec(codec_cfg)
    disc_cfg = DiscriminatorConfig(
        sample_rate=16000, periods=(2, 3), rates=(), fft_sizes=(512,)
    )
    disc = Discriminator(disc_cfg)
    g_params = jax.tree.map(jnp.asarray, from_torch_state_dict(codec_cfg, gen_sd))
    d_params = jax.tree.map(
        jnp.asarray, discriminator_from_torch_state_dict(disc_cfg, disc_sd)
    )

    recon = L.ReconstructionLoss(
        sample_rate=16000,
        waveform_args={},
        multi_scale_stft_args={},
        mel_spectrogram_args=MEL_ARGS,
    )
    # the gan_trainer.py factory settings (torch AdamW defaults incl. wd 0.01)
    g_state = TrainState.create(
        apply_fn=None,
        params=g_params,
        tx=adamw(exponential_schedule(LR, GAMMA), b1=0.8, b2=0.99, weight_decay=0.01),
    )
    d_state = TrainState.create(
        apply_fn=None,
        params=d_params,
        tx=adamw(exponential_schedule(LR, GAMMA), b1=0.8, b2=0.99, weight_decay=0.01),
    )

    my_steps = []
    rng = jax.random.PRNGKey(0)  # quantizer_dropout 0.0: draw is inert
    for audio in _batches():
        g_state, d_state, metrics = gan_train_step(
            codec,
            disc,
            recon,
            g_state,
            d_state,
            jnp.asarray(audio)[:, :, None],
            rng,
        )
        my_steps.append({k: float(metrics[k]) for k in METRIC_KEYS})

    for i, (mine, ref) in enumerate(zip(my_steps, ref_steps)):
        for k in METRIC_KEYS:
            np.testing.assert_allclose(
                mine[k],
                ref[k],
                rtol=5e-3,
                err_msg=f"step {i} metric {k}",
            )
