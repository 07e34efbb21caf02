"""Real-size s2a training step on the TPU: 464M-param injection Conformer,
batch 32 x 768 frames (the reference recipe), bf16 compute + gradient
checkpointing, frozen-codec masking, AdamW."""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.train.optim import adamw, freeze_subtree_mask, warmup_cosine_schedule

batch, t = 32, 768
# dropouts 0.0 = the reference training recipe
# (/root/reference/configs/injection_conformer/train_config.yaml:30-32);
# the base-config default 0.1 costs ~19 ms/block in threefry mask generation
cfg = S2AConfig(codec=CodecConfig(), gradient_checkpointing=True,
                encoder_attn_dropout=0.0, encoder_ff_dropout=0.0,
                encoder_conv_dropout=0.0)
model = InjectionConformer(cfg, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
params = jax.jit(
    lambda r: model.init(r, jnp.zeros((1, 12, 8), jnp.int32),
                         jnp.zeros((1, 8), jnp.int32), mask_rng=r, train=False)
)(rng)
codec = Codec(CodecConfig(), dtype=jnp.bfloat16)
codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
params = {"params": {**params["params"], "codec": codec_params["params"]}}
n = sum(x.size for x in jax.tree_util.tree_leaves(params))
print(f"params: {n / 1e6:.0f} M")

frozen = freeze_subtree_mask(params, "codec")
tx = adamw(warmup_cosine_schedule(3e-4, 4000, 100_000), grad_clip=0.5,
           frozen_mask=frozen)
state = train_state.TrainState.create(apply_fn=None, params=params, tx=tx)

ac = jax.random.randint(rng, (batch, 12, t), 0, 1024)
sem = jax.random.randint(rng, (batch, t), 0, 1024)


@functools.partial(jax.jit, donate_argnums=(0,))
def step(state, ac, sem, rng):
    def loss_fn(p):
        drop, mask = jax.random.split(rng)
        out = model.apply(p, ac, sem, mask_rng=mask, train=True,
                          rngs={"dropout": drop})
        return out["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


t0 = time.time()
state, loss = step(state, ac, sem, jax.random.PRNGKey(1))
print(f"compile+step1: {time.time() - t0:.1f}s loss={float(loss):.3f}", flush=True)

t0 = time.time()
n_steps = 5
for i in range(n_steps):
    state, loss = step(state, ac, sem, jax.random.PRNGKey(2 + i))
loss = float(loss)
dt = (time.time() - t0) / n_steps
audio_s = batch * t / 50.0
print(f"step time: {dt * 1e3:.0f} ms ({audio_s / dt:.0f} audio-s/s/chip) "
      f"loss={loss:.3f}")
assert np.isfinite(loss)
print("s2a train step on TPU: OK")
