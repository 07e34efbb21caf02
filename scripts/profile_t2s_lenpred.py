"""Length-predictor share of the t2s train step (round-3 verdict item).

The full-step ablation (profile_t2s_train.py nolen) needs a fresh >30 min
tunnel compile of the big graph; this measures the SAME quantity from the
other side: the 4-layer length predictor's fwd+bwd as its own jitted
program at the recipe shape (B32, text ~186 bytes) — small graph, fast
compile. Subtracting from the 252 ms full step bounds what "overlapping"
the predictor with the main encoder could possibly save; since a v5e has
ONE TensorCore, independent ops serialize anyway and the only lever is
making the predictor cheaper, which its measured share bounds.
"""

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

rng_np = np.random.default_rng(0)
examples = [
    {
        "transcription_bytes": list(rng_np.integers(32, 127, 180)),
        "semantic_tokens": list(rng_np.integers(0, 1024, 1200)),
    }
    for _ in range(batch)
]
b = collate_t2s(examples)
print("text canvas:", b["text_ids"].shape, flush=True)

tx = adamw(warmup_cosine_schedule(2.5e-4, 4000, 300_000), grad_clip=0.5)
state = train_state.TrainState.create(apply_fn=None, params=params, tx=tx)


@functools.partial(jax.jit, donate_argnums=(0,))
def lp_step(state, batch, rng):
    def loss_fn(p):
        pred = model.apply(
            p, batch["text_ids"], batch["text_attention_mask"],
            train=True, rngs={"dropout": rng},
            method=TextToSemantic.predict_log_length,
        )
        return jnp.mean(jnp.abs(
            pred - jnp.log(batch["speech_lengths"].astype(jnp.float32))
        ))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


batch_dev = jax.device_put(b)
t0 = time.time()
state, loss = lp_step(state, batch_dev, jax.random.PRNGKey(1))
print(f"compile+step1: {time.time() - t0:.1f}s len_loss={float(loss):.3f}",
      flush=True)
t0 = time.time()
n = 10
for i in range(n):
    state, loss = lp_step(state, batch_dev, jax.random.PRNGKey(2 + i))
_ = float(loss)
dt = (time.time() - t0) / n * 1e3
print(f"length-predictor fwd+bwd(+adamw over all params): {dt:.1f} ms "
      f"= {dt / 252 * 100:.1f}% of the 252 ms full step")
