"""Jitted two-optimizer GAN training step for the codec.

The reference's per-batch sequence (gan_trainer.py:116-163) — G forward, D
loss backward + D step, then recon + adversarial/feature losses against the
*updated* D, G backward + G step — is compiled into ONE jitted function of
(g_state, d_state, audio, rng). The quantizer-dropout PRNG is shared between
the D-step forward and the G-step forward so both see the same fake audio
(the reference computes the fake once). Loss weighting follows the YAML
lambdas (mel 15.0, feat 2.0, gen 1.0, commit 0.25, codebook 1.0 —
configs/dac/train_config.yaml:62-67).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from edm_tts_tpu.models.codec.losses import (
    ReconstructionLoss,
    discriminator_loss,
    generator_adversarial_losses,
)

Array = jax.Array

DEFAULT_LAMBDAS: Mapping[str, float] = {
    "mel/loss": 15.0,
    "adv/feat_loss": 2.0,
    "adv/gen_loss": 1.0,
    "vq/commitment_loss": 0.25,
    "vq/codebook_loss": 1.0,
}


class TrainState(train_state.TrainState):
    pass


def _guarded_apply(state: TrainState, grads):
    """apply_gradients fenced on grad finiteness: a non-finite gradient
    keeps params/opt-state float leaves while integer leaves (step AND the
    optax counts — the ExponentialLR schedule reads the optax count) still
    advance, so the schedule stays on time. Returns (new_state, skipped)."""
    finite = jnp.isfinite(optax.global_norm(grads))
    updated = state.apply_gradients(grads=grads)
    new_state = jax.tree_util.tree_map(
        lambda old, new: new
        if jnp.issubdtype(jnp.asarray(new).dtype, jnp.integer)
        else jnp.where(finite, new, old),
        state,
        updated,
    )
    return new_state, 1.0 - finite.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnums=(0, 1, 2, 8, 9), donate_argnums=(3, 4)
)
def gan_train_step(
    codec,  # Codec module (static)
    disc,  # Discriminator module (static)
    recon_loss: ReconstructionLoss,  # static (hashable by id)
    g_state: TrainState,
    d_state: TrainState,
    audio: Array,
    rng: Array,
    lambdas: Mapping[str, float] | None = None,
    skip_nonfinite: bool = False,  # static
    watch: str | None = None,  # static: WANDB_WATCH analog (train/watch.py)
):
    """One G+D update. ``audio``: (B, T, 1). Returns (g_state, d_state, metrics).

    ``skip_nonfinite``: fence BOTH optimizer updates on their gradient
    norms being finite (adversarial training hardening the reference lacks;
    skips surface as metrics["skipped_nonfinite"])."""
    lambdas = dict(lambdas or DEFAULT_LAMBDAS)
    q_rng, _ = jax.random.split(rng)

    # --- discriminator step (fake detached) ---
    def d_loss_fn(d_params):
        out = codec.apply(g_state.params, audio, train=True, rng=q_rng)
        fake = jax.lax.stop_gradient(out["audio"])
        d_fake = disc.apply(d_params, fake)
        d_real = disc.apply(d_params, audio)
        return discriminator_loss(d_fake, d_real)

    d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
    if skip_nonfinite:
        d_state, d_skipped = _guarded_apply(d_state, d_grads)
    else:
        d_state = d_state.apply_gradients(grads=d_grads)

    # --- generator step against the updated discriminator ---
    def g_loss_fn(g_params):
        out = codec.apply(g_params, audio, train=True, rng=q_rng)
        fake = out["audio"]
        losses = dict(recon_loss(fake, audio))
        d_fake = disc.apply(d_state.params, fake)
        d_real = disc.apply(d_state.params, audio)
        gen_l, feat_l = generator_adversarial_losses(d_fake, d_real)
        losses["adv/gen_loss"] = gen_l
        losses["adv/feat_loss"] = feat_l
        losses["vq/commitment_loss"] = out["vq/commitment_loss"]
        losses["vq/codebook_loss"] = out["vq/codebook_loss"]
        total = sum(
            w * losses[k] for k, w in lambdas.items() if k in losses
        )
        losses["loss"] = total
        return total, losses

    (_, metrics), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        g_state.params
    )
    if skip_nonfinite:
        g_state, g_skipped = _guarded_apply(g_state, g_grads)
        metrics["skipped_nonfinite"] = jnp.maximum(d_skipped, g_skipped)
    else:
        g_state = g_state.apply_gradients(grads=g_grads)
    metrics["adv/disc_loss"] = d_loss
    if watch:
        # Reference codec training runs under WANDB_WATCH=all
        # (run_codec_training.py:201) — per-tensor G and D grad/param norms.
        from edm_tts_tpu.train.watch import watch_metrics

        for prefix, grads, state in (
            ("gen/", g_grads, g_state), ("disc/", d_grads, d_state)
        ):
            for k, v in watch_metrics(
                watch, grads=grads, params=state.params
            ).items():
                metrics[k.replace("watch/", "watch/" + prefix, 1)] = v
    return g_state, d_state, metrics


@functools.partial(jax.jit, static_argnums=(0, 1))
def gan_eval_step(codec, recon_loss: ReconstructionLoss, g_params, audio: Array):
    """Eval: reconstruct and return the mel loss + recon audio
    (reference _evaluate computes mel loss on gathered recon,
    gan_trainer.py:229-248)."""
    out = codec.apply(g_params, audio)
    losses = recon_loss(out["audio"], audio)
    return losses["mel/loss"], out["audio"]
