"""Crux-test: can gradient accumulation (micro-batching) beat the s2a
recipe's remat tax?

The 464M s2a step at the recipe shape (B32 x 768) must run gradient
checkpointing ("mha" policy) because un-remat'd activations do not fit the
16 GB HBM (benchmarks/README.md). But remat is a FLOPs tax: the "mha"
backward recomputes everything in each block except the attention kernel
(~ +0.7x forward). Micro-batching shrinks live activations linearly, so a
B8 x 4 or B16 x 2 scan might fit a cheaper (or no) remat policy and win
end-to-end despite re-reading the 0.93 GB bf16 weight set once per
microbatch.

The accumulation is exact-recipe math, not an approximation: per-microbatch
grads are weighted by the masked-token count (the reference loss is a mean
over masked positions of the FULL batch, modeling_injection_conformer.py's
masked CE), so sum(w_i * g_i)/sum(w_i) equals the full-batch gradient.

Usage: python scripts/s2a_microbatch_crux.py {mha32|dots16|none16|dots8|none8}
Each mode is its own process so an OOM doesn't kill the ladder.
"""

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

MODES = {
    # name: (micro_bs, remat, policy)
    "mha32": (32, True, "mha"),    # the current recipe baseline
    "dots16": (16, True, "dots"),
    "none16": (16, False, "mha"),
    "dots8": (8, True, "dots"),
    "none8": (8, False, "mha"),
    "none4": (4, False, "mha"),
}

BATCH, T = 32, 768


def main(mode: str) -> None:
    micro_bs, remat, policy = MODES[mode]
    n_micro = BATCH // micro_bs
    cfg = S2AConfig(
        codec=CodecConfig(), gradient_checkpointing=remat, remat_policy=policy,
        encoder_attn_dropout=0.0, encoder_ff_dropout=0.0,
        encoder_conv_dropout=0.0,
    )
    model = InjectionConformer(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 12, 8), jnp.int32),
                             jnp.zeros((1, 8), jnp.int32), mask_rng=r,
                             train=False)
    )(rng)
    codec = Codec(CodecConfig(), dtype=jnp.bfloat16)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
    params = {"params": {**params["params"], "codec": codec_params["params"]}}

    frozen = freeze_subtree_mask(params, "codec")
    tx = adamw(warmup_cosine_schedule(3e-4, 4000, 100_000), grad_clip=0.5,
               frozen_mask=frozen)
    state = train_state.TrainState.create(apply_fn=None, params=params, tx=tx)

    ac = jax.random.randint(rng, (n_micro, micro_bs, 12, T), 0, 1024)
    sem = jax.random.randint(rng, (n_micro, micro_bs, T), 0, 1024)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, ac, sem, rng):
        rngs = jax.random.split(rng, n_micro)

        def micro(carry, inp):
            g_acc, w_acc = carry
            ac_i, sem_i, rng_i = inp

            def loss_fn(p):
                drop, mask = jax.random.split(rng_i)
                out = model.apply(p, ac_i, sem_i, mask_rng=mask, train=True,
                                  rngs={"dropout": drop})
                w = jnp.sum(out["mask"]).astype(jnp.float32)
                return out["loss"] * w, (out["loss"], w)

            (_, (loss, w)), g = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            g_acc = jax.tree_util.tree_map(lambda a, b: a + b, g_acc, g)
            return (g_acc, w_acc + w), loss

        g0 = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape, jnp.float32), state.params)
        (g, wtot), losses = jax.lax.scan(micro, (g0, jnp.float32(0.0)),
                                         (ac, sem, rngs))
        g = jax.tree_util.tree_map(lambda x: x / wtot, g)
        return state.apply_gradients(grads=g), losses.mean()

    t0 = time.time()
    state, loss = step(state, ac, sem, jax.random.PRNGKey(1))
    loss = float(loss)  # host transfer = the only real sync on axon
    print(f"[{mode}] compile+step1: {time.time() - t0:.1f}s loss={loss:.3f}",
          flush=True)

    n_steps = 5
    t0 = time.time()
    for i in range(n_steps):
        state, loss = step(state, ac, sem, jax.random.PRNGKey(2 + i))
    loss = float(loss)
    dt = (time.time() - t0) / n_steps
    audio_s = BATCH * T / 50.0
    assert np.isfinite(loss)
    print(f"[{mode}] step: {dt * 1e3:.0f} ms ({audio_s / dt:.0f} "
          f"audio-s/s/chip) loss={loss:.3f}")


if __name__ == "__main__":
    main(sys.argv[1])
