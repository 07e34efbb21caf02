"""Batched-throughput knee triage (VERDICT r3 #3): where do B32/B64 lose?

benchmarks/README.md r3: 288 audio-s/s at B16 -> 277 (B32) -> 261 (B64) on
full 650-token canvases. Three measurements to localize it:

1. Per-stage device time at B in {16, 32, 64} (t2s sampler, s2a sampler,
   decoder) — which stage stops scaling. Decode output is reduced to a
   scalar ON DEVICE so the 40 MB B64 waveform never rides the tunnel into
   the timing.
2. Bare attention kernel block_q sweep at the two inference shapes
   (t2s h8 d24, s2a h16 d64; T = 658) for B 16/32/64 — is the r3 auto
   block choice (ops/pallas_attention.py::_auto_block) still right at B>=32,
   or does a retune move the knee?
3. The quadratic-term hypothesis check: attention share of each stage at
   each batch (kernel time x layers x iterations vs stage total).

Usage: python scripts/profile_batched_knee.py [stages|attn]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig, s2a_sample
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic, t2s_sample
from edm_tts_tpu.ops.pallas_attention import flash_mha

which = set(sys.argv[1:]) or {"stages", "attn"}

T_GEN, T_PROMPT = 500, 150
rng = jax.random.PRNGKey(0)


def T(fn, n=6):
    out = fn(0)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(i)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


if "stages" in which:
    dtype = jnp.bfloat16
    codec_cfg = CodecConfig()
    s2a_cfg = S2AConfig(codec=codec_cfg)
    t2s_cfg = T2SConfig(hidden_size=384, main_encoder_num_layers=12,
                        main_encoder_num_heads=8, main_encoder_dim_head=24,
                        length_predictor_num_heads=8,
                        length_predictor_dim_head=24)
    s2a = InjectionConformer(s2a_cfg, dtype=dtype)
    t2s = TextToSemantic(t2s_cfg, dtype=dtype)
    s2a_params = jax.jit(
        lambda r: s2a.init(r, jnp.zeros((1, 12, 8), jnp.int32),
                           jnp.zeros((1, 8), jnp.int32), mask_rng=r,
                           train=False)
    )(rng)
    codec = Codec(codec_cfg, dtype=dtype)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
    s2a_params = {
        "params": {**s2a_params["params"], "codec": codec_params["params"]}
    }
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
        )
    )(rng)
    # decode reduced on device: no 40 MB waveform transfer in the timing
    decode = jax.jit(lambda p, c: jnp.mean(jnp.abs(
        s2a.apply(p, c, method="decode_audio"))))

    print(f"{'B':>4} {'t2s':>8} {'s2a':>8} {'decode':>8} {'sum':>8} "
          f"{'audio-s/s':>10}", flush=True)
    for b in (16, 32, 64):
        text = jax.random.randint(rng, (b, 100), 5, 261)
        tl = jnp.full((b,), 100, jnp.int32)
        pa = jax.random.randint(rng, (1, 12, T_PROMPT), 0, 1024)
        ps = jax.random.randint(rng, (1, T_PROMPT), 0, 1024)
        gt = jnp.full((b,), T_GEN, jnp.int32)
        sem = jax.random.randint(rng, (b, T_GEN), 0, 1024)
        codes = jax.random.randint(rng, (b, 12, T_GEN + T_PROMPT), 0, 1024)
        pa_b = jnp.broadcast_to(pa, (b, 12, T_PROMPT))
        ps_b = jnp.broadcast_to(ps, (b, T_PROMPT))

        t_t2s = T(lambda i: t2s_sample(
            t2s, t2s_params, text, tl, jax.random.PRNGKey(i), pred_iters=16,
            max_speech_len=T_GEN, gt_length=gt)["semantic_tokens"])
        t_s2a = T(lambda i: s2a_sample(
            s2a, s2a_params, sem, pa_b, ps_b, jax.random.PRNGKey(i), steps=8))
        t_dec = T(lambda i: decode(s2a_params, codes))
        tot = t_t2s + t_s2a + t_dec
        print(f"{b:>4} {t_t2s:8.1f} {t_s2a:8.1f} {t_dec:8.1f} {tot:8.1f} "
              f"{b * T_GEN / 50 / (tot / 1e3):10.1f}", flush=True)

if "attn" in which:
    t_seq = 658  # bucketed canvas (prompt 150 + gen 500, 64-rounded + pad)
    for label, h, d in (("t2s h8 d24", 8, 24), ("s2a h16 d64", 16, 64)):
        for b in (16, 32, 64):
            q = jax.random.normal(rng, (b, t_seq, h, d), jnp.bfloat16)
            k = jax.random.normal(jax.random.PRNGKey(1), (b, t_seq, h, d),
                                  jnp.bfloat16)
            v = jax.random.normal(jax.random.PRNGKey(2), (b, t_seq, h, d),
                                  jnp.bfloat16)
            mask = jnp.ones((b, t_seq), bool)
            row = []
            for bq in (None, 64, 128, 256, 512, 704):
                fwd = jax.jit(lambda q, k, v, m, _bq=bq: jnp.sum(
                    flash_mha(q, k, v, mask=m, block_q=_bq)
                    .astype(jnp.float32)))
                row.append((bq, T(lambda i: fwd(q, k, v, mask), n=10)))
            best = min(row, key=lambda x: x[1])
            cells = "  ".join(f"bq={bq or 'auto':>4}:{ms:7.2f}" for bq, ms in row)
            print(f"[{label} B{b:>2}] {cells}  <- best bq={best[0]}",
                  flush=True)
