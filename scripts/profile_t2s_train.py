"""Ablation profile of the t2s training step on the real chip (dev utility).

Attributes step time to components by timing jitted value_and_grad of
surgically modified losses: remat policy, embedding/CE backward style
(MXU one-hot matmul vs XLA scatter-add), length predictor, logits head.

Usage: python scripts/profile_t2s_train.py [full nolen enc old_embed_ce fullremat noremat]
"""

import functools
import math
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from edm_tts_tpu.data.collators import collate_t2s
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
from edm_tts_tpu.train.optim import adamw, warmup_cosine_schedule

batch = 32
rng = jax.random.PRNGKey(0)

rng_np = np.random.default_rng(0)
examples = [
    {
        "transcription_bytes": list(rng_np.integers(32, 127, 180)),
        "semantic_tokens": list(rng_np.integers(0, 1024, 1200)),
    }
    for _ in range(batch)
]
b = collate_t2s(examples)
print("canvas:", b["input_ids"].shape, flush=True)
batch_dev = jax.device_put(b)


def init_params(model):
    return jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
        )
    )(rng)


def run(label, loss_builder, remat=True, policy="dots", n=4):
    c = T2SConfig(hidden_size=384, main_encoder_num_layers=12,
                 main_encoder_num_heads=8, main_encoder_dim_head=24,
                length_predictor_num_heads=8, length_predictor_dim_head=24,
                  gradient_checkpointing=remat, remat_policy=policy)
    model = TextToSemantic(c, dtype=jnp.bfloat16)
    params = init_params(model)
    tx = adamw(warmup_cosine_schedule(2.5e-4, 4000, 300_000), grad_clip=0.5)
    state = train_state.TrainState.create(apply_fn=None, params=params, tx=tx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        def loss_fn(p):
            return loss_builder(model, c, p, batch, rng)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    t0 = time.time()
    state, loss = step(state, batch_dev, jax.random.PRNGKey(1))
    _ = float(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(n):
        state, loss = step(state, batch_dev, jax.random.PRNGKey(2 + i))
    _ = float(loss)  # host readback forces completion
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:44s} {dt:7.1f} ms  (compile {compile_s:.0f}s)", flush=True)
    return dt


def full_loss(model, c, p, batch, rng):
    drop, mask = jax.random.split(rng)
    out = model.apply(
        p, batch["input_ids"], batch["attention_mask"],
        batch["speech_mask"], batch["text_ids"],
        batch["text_attention_mask"], batch["speech_lengths"],
        mask_rng=mask, train=True, rngs={"dropout": drop},
    )
    return out["loss"]


def _mask_and_inputs(c, batch, mask_rng):
    ids = batch["input_ids"]
    bsz, l = ids.shape
    u_key, b_key = jax.random.split(mask_rng)
    u = jax.random.uniform(u_key, (bsz, 1), maxval=math.pi / 2)
    mask = (jax.random.uniform(b_key, (bsz, l)) < jnp.cos(u)) & batch["speech_mask"]
    masked = jnp.where(mask, 4, ids)
    targets = ids - c.semantic_offset
    lm = mask & (targets != 0)
    st = jnp.clip(targets, 0, c.semantic_vocab_size - 1)
    return masked, st, lm


def no_length_loss(model, c, p, batch, rng):
    """Main-encoder CE only (drops the 4-layer length predictor)."""
    drop, mask_rng = jax.random.split(rng)
    masked, st, lm = _mask_and_inputs(c, batch, mask_rng)
    logits = model.apply(
        p, model.apply(p, masked, method="embed"), batch["attention_mask"],
        train=True, rngs={"dropout": drop}, method="embeddings_to_logits",
    )
    from edm_tts_tpu.ops import masked_cross_entropy
    return masked_cross_entropy(logits, st, lm)


def old_embed_ce(model, c, p, batch, rng):
    """Round-1 style: plain gather embedding (scatter-add backward) + CE via
    log_softmax take_along_axis (scatter backward)."""
    drop, mask_rng = jax.random.split(rng)
    masked, st, lm = _mask_and_inputs(c, batch, mask_rng)
    table = p["params"]["input_embedding"]["embedding"]
    emb = jnp.take(table, masked, axis=0).astype(jnp.bfloat16)
    emb = emb * (masked != 0)[..., None].astype(emb.dtype)
    logits = model.apply(
        p, emb, batch["attention_mask"],
        train=True, rngs={"dropout": drop}, method="embeddings_to_logits",
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, st[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * lm) / jnp.maximum(jnp.sum(lm), 1)


def encoder_only(model, c, p, batch, rng):
    """Conformer fwd+bwd only (no embed bwd, no CE, no logits head)."""
    drop, _ = jax.random.split(rng)
    bsz, l = batch["input_ids"].shape
    x = jax.lax.stop_gradient(
        jax.random.normal(jax.random.PRNGKey(0), (bsz, l, c.hidden_size),
                          jnp.bfloat16)
    )
    h = model.apply(p, x, batch["attention_mask"],
                    method=lambda m, e, am: m.conformer(e, mask=am, train=True),
                    rngs={"dropout": drop})
    return jnp.mean(h.astype(jnp.float32))


which = set(sys.argv[1:]) or {"full", "nolen", "enc", "old_embed_ce",
                              "fullremat", "noremat"}

if "full" in which:
    run("full step (dots remat, matmul embed/CE)", full_loss)
if "old_embed_ce" in which:
    run("scatter embed/CE (round-1 style)", old_embed_ce)
if "nolen" in which:
    run("- length predictor", no_length_loss)
if "nolen_noremat" in which:
    run("- length predictor, remat OFF (recipe)", no_length_loss, remat=False)
if "enc" in which:
    run("encoder only (no embed/CE/head)", encoder_only)
if "fullremat" in which:
    run("full step, remat policy FULL (round-1)", full_loss, policy="full")
if "noremat" in which:
    run("full step, remat OFF", full_loss, remat=False)
