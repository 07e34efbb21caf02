"""Per-stage pipeline latency profile on the real chip (dev utility)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
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

text = jax.random.randint(rng, (1, 100), 5, 261)
tl = jnp.asarray([100], jnp.int32)
pa = jax.random.randint(rng, (1, 12, 150), 0, 1024)
ps = jax.random.randint(rng, (1, 150), 0, 1024)
gt = jnp.asarray([500], jnp.int32)
sem = jax.random.randint(rng, (1, 500), 0, 1024)
codes = jax.random.randint(rng, (1, 12, 500), 0, 1024)
decode = jax.jit(lambda p, c: s2a.apply(p, c, method="decode_audio"))


def T(fn, n=10):
    _ = np.asarray(jax.tree_util.tree_leaves(fn(0))[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(i)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1e3


print(f"t2s: {T(lambda i: t2s_sample(t2s, t2s_params, text, tl, jax.random.PRNGKey(i), pred_iters=16, max_speech_len=500, gt_length=gt)['semantic_tokens']):.1f} ms", flush=True)
print(f"s2a: {T(lambda i: s2a_sample(s2a, s2a_params, sem, pa, ps, jax.random.PRNGKey(i), steps=8)):.1f} ms", flush=True)
print(f"decode: {T(lambda i: decode(s2a_params, codes)):.1f} ms", flush=True)
null = jax.jit(lambda x: x + 1)
print(f"null roundtrip: {T(lambda i: null(jnp.float32(i)), n=20):.2f} ms", flush=True)
