"""A/B the _auto_block alignment change inside ONE process (dev utility).

Cross-process stage-sweep runs swing several % with tunnel congestion; this
pins the block-selection variants against each other in the same process,
same arrays, interleaved: for each batch size, time the real samplers with
the OLD block rule (clamp to exact T — unaligned rows at T=650/602
canvases) and the NEW one (round up to 64, pad; ops/pallas_attention.py
round-4 change) by monkeypatching `_auto_block` before each trace.

Usage: python scripts/profile_autoblock_ab.py [batch ...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import edm_tts_tpu.ops.pallas_attention as pa
from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig, s2a_sample
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic, t2s_sample

T_GEN, T_PROMPT = 500, 150
rng = jax.random.PRNGKey(0)
batches = [int(a) for a in sys.argv[1:]] or [32, 64]


def old_rule(t, other, budget_bytes=6_500_000):
    n_blocks = max(1, -(-(t * other * 4) // budget_bytes))
    return min(t, -(-(-(-t // n_blocks)) // 64) * 64)


new_rule = pa._auto_block


def T(fn, n=8):
    out = fn(0)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(i)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


dtype = jnp.bfloat16
codec_cfg = CodecConfig()
s2a_cfg = S2AConfig(codec=codec_cfg)
t2s_cfg = T2SConfig(hidden_size=384, main_encoder_num_layers=12,
                    main_encoder_num_heads=8, main_encoder_dim_head=24,
                    length_predictor_num_heads=8, length_predictor_dim_head=24)
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

for b in batches:
    text = jax.random.randint(rng, (b, 100), 5, 261)
    tl = jnp.full((b,), 100, jnp.int32)
    pa_codes = jax.random.randint(rng, (1, 12, T_PROMPT), 0, 1024)
    ps = jax.random.randint(rng, (1, T_PROMPT), 0, 1024)
    gt = jnp.full((b,), T_GEN, jnp.int32)
    sem = jax.random.randint(rng, (b, T_GEN), 0, 1024)
    pa_b = jnp.broadcast_to(pa_codes, (b, 12, T_PROMPT))
    ps_b = jnp.broadcast_to(ps, (b, T_PROMPT))

    for name, rule in (("old", old_rule), ("new", new_rule)):
        pa._auto_block = rule
        # fresh traces: the sampler jit caches key on shapes, so the patched
        # rule is only consulted on a retrace — drop all caches
        jax.clear_caches()
        t_t2s = T(lambda i: t2s_sample(
            t2s, t2s_params, text, tl, jax.random.PRNGKey(i), pred_iters=16,
            max_speech_len=T_GEN, gt_length=gt)["semantic_tokens"])
        t_s2a = T(lambda i: s2a_sample(
            s2a, s2a_params, sem, pa_b, ps_b, jax.random.PRNGKey(i), steps=8))
        print(f"B{b:<3} {name}: t2s {t_t2s:7.1f} ms  s2a {t_s2a:7.1f} ms",
              flush=True)
    pa._auto_block = new_rule
