"""Ablation profile of the s2a training step on the real chip (dev utility).

Attributes the ~1.24 s step (batch 32 x 768, 464M) to components by timing
jitted value_and_grad of surgically reduced losses:

  full        the real training step (remat "full")
  enc         16-block conformer stack only (remat full), mean-of-hidden loss
  encnormt    same but remat OFF (measures the recompute tax)
  encnoattn   stack with attention replaced by identity (non-attn share)
  headce      fine head + stacked logits einsum + masked CE on random hidden
  feats       codec codes_to_features_unreduced + embeddings + cumsum only

Usage: python scripts/profile_s2a_train.py [full enc encnormt encnoattn headce feats]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.conformer.conformer import ConformerBlock
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.ops import masked_cross_entropy, rope_frequencies

batch, t = 32, 768
cfg = S2AConfig(codec=CodecConfig(), gradient_checkpointing=True)
h = cfg.hidden_size
rng = jax.random.PRNGKey(0)

ac = jax.random.randint(rng, (batch, 12, t), 0, 1024)
sem = jax.random.randint(rng, (batch, t), 0, 1024)
hidden = jax.random.normal(rng, (batch, t, h), jnp.bfloat16)


def timeit(label, step, args, n=4):
    t0 = time.time()
    out = step(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _i in range(n):
        out = step(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:44s} {dt:7.1f} ms  (compile {compile_s:.0f}s)", flush=True)


def grad_step(model_apply, params):
    @jax.jit
    def step(params, *args):
        def loss_fn(p):
            return model_apply(p, *args)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # touch grads so XLA keeps the whole backward
        gsum = sum(jnp.sum(x.astype(jnp.float32)) for x in
                   jax.tree_util.tree_leaves(grads))
        return loss + 0.0 * gsum

    return step


which = set(sys.argv[1:]) or {"full", "enc", "encnormt", "encnoattn",
                              "headce", "feats"}


class Stack(nn.Module):
    n_layers: int = 16
    remat: bool = True
    no_attn: bool = False

    @nn.compact
    def __call__(self, x):
        ecfg = cfg.encoder_config
        rope = rope_frequencies(t, ecfg.dim_head)

        def apply_block(mdl, x):
            return mdl(x, rope=rope, train=True)

        if self.remat:
            apply_block = nn.remat(apply_block)
        for i in range(self.n_layers):
            x = apply_block(
                ConformerBlock(ecfg, dtype=jnp.bfloat16, name=f"b{i}"), x
            )
        return jnp.mean(x.astype(jnp.float32))


if "full" in which:
    model = InjectionConformer(cfg, dtype=jnp.bfloat16)
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 12, 8), jnp.int32),
                             jnp.zeros((1, 8), jnp.int32), mask_rng=r,
                             train=False)
    )(rng)
    codec = Codec(CodecConfig(), dtype=jnp.bfloat16)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
    params = {"params": {**params["params"], "codec": codec_params["params"]}}

    def full_loss(p, ac, sem):
        out = model.apply(p, ac, sem, mask_rng=jax.random.PRNGKey(3),
                          train=True, rngs={"dropout": jax.random.PRNGKey(4)})
        return out["loss"]

    timeit("full step", grad_step(full_loss, params), (params, ac, sem))

import edm_tts_tpu.models.conformer.conformer as _conf

for name, kw in (("enc", {}), ("encnormt", {"remat": False}),
                 ("encnoattn", {"no_attn": True})):
    if name not in which:
        continue
    orig_mha = _conf.mha
    if kw.pop("no_attn", False):
        # identity "attention": isolates the non-attention share of a block
        _conf.mha = lambda q, k, v, **kws: v
    try:
        stack = Stack(**kw)
        sparams = jax.jit(stack.init)(rng, hidden)
        timeit(f"{name} (16 blocks)",
               grad_step(lambda p, x, stack=stack: stack.apply(
                   p, x, rngs={"dropout": jax.random.PRNGKey(4)}), sparams),
               (sparams, hidden))
    finally:
        _conf.mha = orig_mha

if "headce" in which:
    model = InjectionConformer(cfg, dtype=jnp.bfloat16)
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 12, 8), jnp.int32),
                             jnp.zeros((1, 8), jnp.int32), mask_rng=r,
                             train=False)
    )(rng)

    def headce_loss(p, hid, ac):
        fine = model.apply(p, hid, method=lambda m, x: m.fine_head(x))
        b, tt, _ = hid.shape
        stacked = jnp.concatenate(
            [jnp.stack([hid] * 4, axis=2),
             fine.reshape(b, tt, 8, h)], axis=2)
        logits = model.apply(p, stacked, method="to_logits")
        return masked_cross_entropy(
            logits, ac, jnp.ones(ac.shape, bool))

    timeit("head + stacked logits + CE",
           grad_step(headce_loss, params), (params, hidden, ac))

if "feats" in which:
    codec = Codec(CodecConfig(), dtype=jnp.bfloat16)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))

    def feats_loss(p, ac):
        f = codec.apply(p, ac, method="codes_to_features_unreduced")
        cum = jnp.cumsum(jax.lax.stop_gradient(f), axis=1)
        return jnp.mean(cum.astype(jnp.float32))

    timeit("codec features + cumsum",
           grad_step(feats_loss, codec_params), (codec_params, ac))
