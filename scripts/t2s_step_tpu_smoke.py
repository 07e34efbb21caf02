"""Real-size t2s training step on the TPU: d=384 12-layer main + 4-layer
length predictor, batch 32, ~1.3k-token joint canvases, bf16."""

import functools
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
# gradient_checkpointing false = the reference training recipe
# (/root/reference/configs/text_to_semantic_w_length/train_config.yaml:59);
# the 62M model's activations fit 16G HBM without remat at batch 32
cfg = T2SConfig(hidden_size=384, main_encoder_num_layers=12,
                 main_encoder_num_heads=8, main_encoder_dim_head=24,
                length_predictor_num_heads=8, length_predictor_dim_head=24,
                gradient_checkpointing=False)
model = TextToSemantic(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = jax.jit(
    lambda r: model.init(
        r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
        jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
        jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
    )
)(rng)
print("params:", sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6, "M")

# synthetic batch through the real collator (~1200 semantic tokens/sample)
rng_np = np.random.default_rng(0)
examples = [
    {
        "transcription_bytes": list(rng_np.integers(32, 127, 180)),
        "semantic_tokens": list(rng_np.integers(0, 1024, 1200)),
    }
    for _ in range(batch)
]
b = collate_t2s(examples)
print("canvas:", b["input_ids"].shape)

tx = adamw(warmup_cosine_schedule(2.5e-4, 4000, 300_000), grad_clip=0.5)
state = train_state.TrainState.create(apply_fn=None, params=params, tx=tx)


@functools.partial(jax.jit, donate_argnums=(0,))
def step(state, batch, rng):
    def loss_fn(p):
        drop, mask = jax.random.split(rng)
        out = model.apply(
            p, batch["input_ids"], batch["attention_mask"],
            batch["speech_mask"], batch["text_ids"],
            batch["text_attention_mask"], batch["speech_lengths"],
            mask_rng=mask, train=True, rngs={"dropout": drop},
        )
        return out["loss"], (out["ce_loss"], out["length_loss"])

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    return state.apply_gradients(grads=grads), loss, aux


batch_dev = jax.device_put(b)
t0 = time.time()
state, loss, aux = step(state, batch_dev, jax.random.PRNGKey(1))
print(f"compile+step1: {time.time() - t0:.1f}s loss={float(loss):.3f} "
      f"ce={float(aux[0]):.3f} len={float(aux[1]):.3f}", flush=True)

t0 = time.time()
n = 5
for i in range(n):
    state, loss, aux = step(state, batch_dev, jax.random.PRNGKey(2 + i))
loss = float(loss)
dt = (time.time() - t0) / n
print(f"step time: {dt * 1e3:.0f} ms ({batch * 1200 / 50 / dt:.0f} audio-s/s/chip) "
      f"loss={loss:.3f}")
assert np.isfinite(loss)
print("t2s train step on TPU: OK")
