"""GANTrainer integration: a few adversarial steps on synthetic audio with
eval, best-model export, audio-sample logging, checkpoint + resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.codec.discriminator import Discriminator, DiscriminatorConfig
from edm_tts_tpu.models.codec.losses import ReconstructionLoss
from edm_tts_tpu.parallel.mesh import make_mesh
from edm_tts_tpu.train.gan_trainer import GANTrainer, GANTrainingArguments

TINY_CODEC = CodecConfig(
    encoder_dim=4, decoder_dim=32, n_codebooks=2, codebook_size=16,
    codebook_dim=4, quantizer_dropout=0.5,
)
TINY_DISC = DiscriminatorConfig(periods=(2,), fft_sizes=(128,))


def _trainer(out_dir, max_steps):
    codec = Codec(TINY_CODEC)
    disc = Discriminator(TINY_DISC)
    x = jnp.zeros((1, 640, 1))
    g_params = jax.jit(codec.init)(jax.random.PRNGKey(0), x)
    d_params = jax.jit(disc.init)(jax.random.PRNGKey(1), x)
    recon = ReconstructionLoss(
        16000,
        mel_spectrogram_args={
            "n_mels": (5,), "window_lengths": (64,),
            "mel_fmin": (0.0,), "mel_fmax": (None,),
        },
    )
    args = GANTrainingArguments(
        output_dir=str(out_dir), max_steps=max_steps, logging_steps=1,
        eval_steps=2, save_steps=2, num_samples_to_log=1,
    )
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    return GANTrainer(args, codec, disc, g_params, d_params, recon, mesh=mesh)


def _audio_iter():
    rng = np.random.default_rng(0)
    while True:
        t = np.arange(640) / 16000
        sig = 0.3 * np.sin(2 * np.pi * 300 * t)[None, :, None]
        yield np.repeat(sig, 2, 0).astype(np.float32) + \
            0.01 * rng.standard_normal((2, 640, 1)).astype(np.float32)


def test_gan_trainer_train_eval_export_resume(tmp_path):
    out = tmp_path / "gan"
    trainer = _trainer(out, max_steps=2)

    def eval_iter():
        it = _audio_iter()
        return [next(it) for _ in range(1)]

    trainer.train(_audio_iter(), eval_iter(), config_json=TINY_CODEC.to_json())
    assert trainer.ckpt.latest_step() == 2
    # eval ran at step 2 -> best model exported + audio samples written
    assert (out / "best_model" / "config.json").exists()
    assert (out / "samples" / "step_2" / "recon_0.wav").exists()
    assert (out / "metrics.jsonl").exists()

    # resume continues
    trainer2 = _trainer(out, max_steps=4)
    g_state, d_state = trainer2.train(_audio_iter(), None)
    assert int(g_state.step) == 4 and int(d_state.step) == 4

    # exported model is loadable through the hub
    from edm_tts_tpu.utils.hub import load_codec

    codec, params = load_codec(str(out / "best_model"))
    audio = codec.apply(params, jnp.zeros((1, 640, 1)))["audio"]
    assert audio.shape == (1, 640, 1)


def test_gan_trainer_repeated_eval_with_generator_factory(tmp_path):
    """Regression (closed-loop rehearsal bug): eval_iter as a zero-arg
    FACTORY of one-shot generators must give a finite mel loss at EVERY
    eval step — a bare generator was silently consumed by the first eval,
    and every later eval logged NaN."""
    import json

    out = tmp_path / "gan_multi_eval"
    trainer = _trainer(out, max_steps=4)  # eval_steps=2 -> evals at 2 and 4

    def eval_factory():
        it = _audio_iter()
        return (next(it) for _ in range(1))  # one-shot generator per call

    trainer.train(_audio_iter(), eval_factory, config_json=TINY_CODEC.to_json())
    evals = [
        json.loads(l) for l in open(out / "metrics.jsonl")
        if "eval/mel_loss" in l
    ]
    assert [e["step"] for e in evals] == [2, 4]
    assert all(np.isfinite(e["eval/mel_loss"]) for e in evals), evals
