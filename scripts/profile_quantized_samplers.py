"""A/B: bf16 vs weight-only int8 samplers at the real batch-1 inference
shapes (the headline RTF path). The fused batch-1 samplers stream weights at
the HBM read roofline (benchmarks/README.md), so int8 should approach 2x on
the weight-bound stages; decode is activation-bound and is expected NOT to
move. Also reports batched (B16) numbers for the serving knee.

Run on the real chip: python scripts/profile_quantized_samplers.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.quantize import quantize_s2a, quantize_t2s
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig, s2a_sample
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic, t2s_sample

dtype = jnp.bfloat16
codec_cfg = CodecConfig()
s2a_cfg = S2AConfig(codec=codec_cfg)
t2s_cfg = T2SConfig(hidden_size=384, main_encoder_num_layers=12,
                    main_encoder_num_heads=8, main_encoder_dim_head=24,
                    length_predictor_num_heads=8, length_predictor_dim_head=24)
rng = jax.random.PRNGKey(0)
s2a = InjectionConformer(s2a_cfg, dtype=dtype)
t2s = TextToSemantic(t2s_cfg, dtype=dtype)
s2a_params = jax.jit(
    lambda r: s2a.init(r, jnp.zeros((1, 12, 8), jnp.int32),
                       jnp.zeros((1, 8), jnp.int32), mask_rng=r, train=False)
)(rng)
codec = Codec(codec_cfg, dtype=dtype)
codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
s2a_params = {"params": {**s2a_params["params"], "codec": codec_params["params"]}}
t2s_params = jax.jit(
    lambda r: t2s.init(
        r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
        jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
        jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
    )
)(rng)

s2a_q, s2a_qparams = quantize_s2a(s2a, s2a_params)
t2s_q, t2s_qparams = quantize_t2s(t2s, t2s_params)
s2a_w, s2a_wparams = quantize_s2a(s2a, s2a_params, mode="w8a8")
t2s_w, t2s_wparams = quantize_t2s(t2s, t2s_params, mode="w8a8")


def T(fn, n=10):
    _ = np.asarray(jax.tree_util.tree_leaves(fn(0))[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(i)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1e3


def run(b):
    text = jax.random.randint(rng, (b, 100), 5, 261)
    tl = jnp.full((b,), 100, jnp.int32)
    pa = jax.random.randint(rng, (b, 12, 150), 0, 1024)
    ps = jax.random.randint(rng, (b, 150), 0, 1024)
    gt = jnp.full((b,), 500, jnp.int32)
    sem = jax.random.randint(rng, (b, 500), 0, 1024)

    for name, (m, p) in (("bf16", (t2s, t2s_params)),
                         ("int8", (t2s_q, t2s_qparams)),
                         ("w8a8", (t2s_w, t2s_wparams))):
        ms = T(lambda i: t2s_sample(m, p, text, tl, jax.random.PRNGKey(i),
                                    pred_iters=16, max_speech_len=500,
                                    gt_length=gt)["semantic_tokens"])
        print(f"B{b} t2s 16-iter {name}: {ms:7.1f} ms", flush=True)
    for name, (m, p) in (("bf16", (s2a, s2a_params)),
                         ("int8", (s2a_q, s2a_qparams)),
                         ("w8a8", (s2a_w, s2a_wparams))):
        ms = T(lambda i: s2a_sample(m, p, sem, pa, ps, jax.random.PRNGKey(i),
                                    steps=8))
        print(f"B{b} s2a 8+1   {name}: {ms:7.1f} ms", flush=True)

    # token agreement at temperature 0 (greedy): how many ids does int8 flip?
    g_f = s2a_sample(s2a, s2a_params, sem, pa, ps, jax.random.PRNGKey(7),
                     steps=8, greedy=True)
    g_q = s2a_sample(s2a_q, s2a_qparams, sem, pa, ps, jax.random.PRNGKey(7),
                     steps=8, greedy=True)
    agree = float((np.asarray(g_f) == np.asarray(g_q)).mean())
    print(f"B{b} s2a greedy token agreement int8 vs bf16: {agree:.4f}",
          flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.devices()[0]}")
    run(1)
    run(16)
