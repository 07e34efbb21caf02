"""Overfit sanity: a few dozen steps on one fixed batch must drive the loss
far down — catches gradient/masking wiring bugs that shape tests cannot."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training import train_state

from edm_tts_tpu.models.codec import CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
from edm_tts_tpu.train.optim import freeze_subtree_mask


@pytest.mark.slow
def test_s2a_overfits_fixed_batch():
    cfg = S2AConfig(
        hidden_size=64, num_semantic_tokens=8, encoder_num_heads=4,
        encoder_num_layers=3, injection_layers=(1,),
        encoder_attn_dropout=0.0, encoder_ff_dropout=0.0,
        encoder_conv_dropout=0.0,
        codec=CodecConfig(encoder_dim=4, decoder_dim=32, n_codebooks=4,
                          codebook_size=8, codebook_dim=4),
    )
    model = InjectionConformer(cfg)
    rng = jax.random.PRNGKey(0)
    ac = jax.random.randint(rng, (2, 4, 24), 0, 8)
    sem = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, 8)
    params = jax.jit(
        lambda r: model.init(r, ac, sem, mask_rng=r, train=False)
    )(rng)
    tx = optax.adam(3e-3)
    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree_util.tree_map(
            lambda t: "train" if t else "freeze",
            freeze_subtree_mask(params, "codec"),
        ),
    )
    state = train_state.TrainState.create(apply_fn=None, params=params, tx=tx)

    @jax.jit
    def step(state, rng):
        def loss_fn(p):
            return model.apply(p, ac, sem, mask_rng=rng, train=False)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    first = None
    for i in range(80):
        state, loss = step(state, jax.random.PRNGKey(100 + i))
        if first is None:
            first = float(loss)
    last = float(loss)
    assert last < 0.5 * first, (first, last)


@pytest.mark.slow
def test_t2s_overfits_fixed_batch():
    from edm_tts_tpu.data.collators import collate_t2s

    cfg = T2SConfig(
        hidden_size=64, semantic_vocab_size=8, main_encoder_num_heads=4,
        main_encoder_num_layers=2, length_predictor_num_heads=4,
        length_predictor_num_layers=1,
    )
    model = TextToSemantic(cfg)
    rng_np = np.random.default_rng(0)
    batch = collate_t2s(
        [
            {
                "transcription_bytes": list(rng_np.integers(60, 90, 6)),
                # avoid semantic id 0 (excluded from loss by the reference's
                # ignore_index quirk)
                "semantic_tokens": list(rng_np.integers(1, 8, 20)),
            }
            for _ in range(2)
        ],
        pad_to_multiple=16,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = jax.jit(
        lambda r: model.init(
            r, batch["input_ids"], batch["attention_mask"],
            batch["speech_mask"], batch["text_ids"],
            batch["text_attention_mask"], batch["speech_lengths"],
            mask_rng=r, train=False,
        )
    )(jax.random.PRNGKey(0))
    tx = optax.adam(3e-3)
    state = train_state.TrainState.create(apply_fn=None, params=params, tx=tx)

    @jax.jit
    def step(state, rng):
        def loss_fn(p):
            out = model.apply(
                p, batch["input_ids"], batch["attention_mask"],
                batch["speech_mask"], batch["text_ids"],
                batch["text_attention_mask"], batch["speech_lengths"],
                mask_rng=rng, train=False,
            )
            return out["loss"], out["ce_loss"]

        (loss, ce), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads=grads), loss, ce

    first_ce = None
    for i in range(80):
        state, loss, ce = step(state, jax.random.PRNGKey(200 + i))
        if first_ce is None:
            first_ce = float(ce)
    assert float(ce) < 0.5 * first_ce, (first_ce, float(ce))
