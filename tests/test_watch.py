"""Gradient/parameter watching (WANDB_WATCH analog, train/watch.py).

The reference runs codec training under ``WANDB_WATCH=all``
(/root/reference/run_codec_training.py:201), which makes wandb log
per-tensor gradient + parameter stats every logging step. Our analog logs
per-tensor L2 norms computed inside the jitted step; these tests pin the
naming scheme, the numeric definition (f32 L2 of the raveled tensor), and
the end-to-end wiring through both trainers' metrics dicts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.train.trainer import Trainer, TrainingArguments
from edm_tts_tpu.train.watch import watch_metrics


def test_watch_metrics_names_and_values():
    tree = {"enc": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                    "bias": jnp.full((4,), 2.0)},
            "head": [jnp.ones((3,))]}
    out = watch_metrics("gradients", grads=tree)
    assert set(out) == {
        "watch/grad_norm/enc/kernel",
        "watch/grad_norm/enc/bias",
        "watch/grad_norm/head/0",
    }
    np.testing.assert_allclose(
        float(out["watch/grad_norm/enc/kernel"]),
        np.linalg.norm(np.arange(6.0)), rtol=1e-6,
    )
    np.testing.assert_allclose(float(out["watch/grad_norm/enc/bias"]), 4.0)
    # "all" adds param norms; None/"false" are no-ops (pass-through call sites)
    both = watch_metrics("all", grads=tree, params=tree)
    assert "watch/param_norm/enc/kernel" in both and len(both) == 6
    assert watch_metrics(None, grads=tree) == {}
    assert watch_metrics("false", grads=tree, params=tree) == {}
    with pytest.raises(ValueError):
        watch_metrics("histograms", grads=tree)


def _tiny_trainer(tmp_path, **kw):
    params = {"params": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}}

    def loss_fn(p, batch, rng):
        pred = batch @ p["params"]["w"] + p["params"]["b"]
        loss = jnp.mean(pred**2)
        return loss, {"loss_weight": jnp.float32(batch.shape[0])}

    args = TrainingArguments(
        output_dir=str(tmp_path), max_steps=2, logging_steps=1,
        save_steps=1000, overwrite_output_dir=True, **kw,
    )
    return Trainer(args, loss_fn, params), args


@pytest.mark.parametrize("micro_batches", [1, 2])
def test_trainer_watch_all_emits_per_tensor_norms(tmp_path, micro_batches):
    trainer, _ = _tiny_trainer(
        tmp_path / f"m{micro_batches}", watch="all", micro_batches=micro_batches
    )
    batch = jnp.ones((4, 4))
    state, metrics = trainer._train_step(
        trainer.state, batch, jax.random.PRNGKey(0)
    )
    assert "watch/grad_norm/params/w" in metrics
    assert "watch/grad_norm/params/b" in metrics
    assert "watch/param_norm/params/w" in metrics
    # grad of mean((x@w+b)^2) wrt b at w=I, b=0, x=1: 2*mean over rows = 2*pred/4... just finiteness+positivity
    assert float(metrics["watch/grad_norm/params/w"]) > 0
    assert np.isfinite(float(metrics["watch/param_norm/params/b"]))
    # param norm is of the PRE-update params fed to guarded_apply
    np.testing.assert_allclose(
        float(metrics["watch/param_norm/params/w"]), 4.0, rtol=1e-6
    )


def test_trainer_watch_off_keeps_metrics_clean(tmp_path):
    trainer, _ = _tiny_trainer(tmp_path)
    _, metrics = trainer._train_step(
        trainer.state, jnp.ones((4, 4)), jax.random.PRNGKey(0)
    )
    assert not any(k.startswith("watch/") for k in metrics)


def test_gan_step_watch(tmp_path):
    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.codec.discriminator import (
        Discriminator,
        DiscriminatorConfig,
    )
    from edm_tts_tpu.models.codec.losses import ReconstructionLoss
    from edm_tts_tpu.train.gan import TrainState, gan_train_step
    from edm_tts_tpu.train.optim import adamw, exponential_schedule

    codec = Codec(CodecConfig(
        encoder_dim=4, decoder_dim=32, n_codebooks=2, codebook_size=16,
        codebook_dim=4, quantizer_dropout=0.5,
    ))
    disc = Discriminator(DiscriminatorConfig(periods=(2,), fft_sizes=(128,)))
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 640, 1)) * 0.1
    g_params = jax.jit(codec.init)(jax.random.PRNGKey(1), audio)
    d_params = jax.jit(disc.init)(jax.random.PRNGKey(2), audio)
    recon = ReconstructionLoss(
        16000,
        mel_spectrogram_args={
            "n_mels": (5,), "window_lengths": (32,),
            "mel_fmin": (0.0,), "mel_fmax": (None,),
        },
    )
    tx = adamw(exponential_schedule(1e-4, 0.999996), b1=0.8, b2=0.99)
    g_state = TrainState.create(apply_fn=None, params=g_params, tx=tx)
    d_state = TrainState.create(apply_fn=None, params=d_params, tx=tx)
    _, _, metrics = gan_train_step(
        codec, disc, recon, g_state, d_state, audio, jax.random.PRNGKey(3),
        None, False, "gradients",
    )
    gen_keys = [k for k in metrics if k.startswith("watch/gen/grad_norm/")]
    disc_keys = [k for k in metrics if k.startswith("watch/disc/grad_norm/")]
    assert gen_keys and disc_keys
    assert not any(k.startswith("watch/gen/param_norm/") for k in metrics)
    vals = np.asarray([float(metrics[k]) for k in gen_keys + disc_keys])
    assert np.isfinite(vals).all()
