"""t2s int8-TRAINING crux (VERDICT r3 #8): does a w8a8 forward pay at B32x1408?

The recipe-parity t2s step stands at 252 ms (B32 x 1408, d=384, no remat,
heads=8 x dim_head=24 quirk — benchmarks/README.md). MFU is ~34%, and the
two prior cruxes (packed-head kernel, length-predictor overlap) were
rejected with measurements. The one untried lever: run the FORWARD matmuls
as native s8xs8 MXU dots (per-row activation quant + on-the-fly per-column
weight quant, straight-through bf16 gradients — `QDense(quantize=
"w8a8_train")`, ops/qdense.py::w8a8_matmul_ste).

What it can win: v5e lists 2x s8 MXU throughput over bf16, and the forward
is ~1/3 of the step's matmul work (fwd, dgrad, wgrad; the backward must
stay bf16 for convergence). Ceiling therefore ~1/6 of matmul time, MINUS
per-step quantization of every activation row AND every weight column
(training updates weights each step — no offline int8 copy to stream,
unlike serving). The w8a8 serving crux already showed d=384 matmuls are
too small for the quant overhead at inference; this measures the training
shape, where T=1408 rows amortize the weight-quant cost better.

Usage: python scripts/t2s_w8a8_train_crux.py [n_steps]
Accept/reject row goes to benchmarks/README.md.
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6
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


def run(label, quantize):
    c = T2SConfig(hidden_size=384, main_encoder_num_layers=12,
                  main_encoder_num_heads=8, main_encoder_dim_head=24,
                  length_predictor_num_heads=8, length_predictor_dim_head=24,
                  gradient_checkpointing=False, quantize=quantize)
    model = TextToSemantic(c, dtype=jnp.bfloat16)
    params = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
        )
    )(rng)
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
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    t0 = time.time()
    state, loss = step(state, batch_dev, jax.random.PRNGKey(1))
    l_first = float(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(N):
        state, loss = step(state, batch_dev, jax.random.PRNGKey(2 + i))
    l_last = float(loss)  # host readback forces completion
    dt = (time.time() - t0) / N * 1e3
    print(f"{label:34s} {dt:7.1f} ms/step  (compile {compile_s:.0f}s, "
          f"loss {l_first:.3f} -> {l_last:.3f})", flush=True)
    return dt


bf16 = run("bf16 (recipe parity)", "none")
w8a8 = run("w8a8_train forward, bf16 grads", "w8a8_train")
print(f"ratio: {w8a8 / bf16:.3f}x "
      f"({'ACCEPT' if w8a8 < 0.97 * bf16 else 'REJECT'})")
