"""Serving throughput: concurrent requests through DynamicBatcher + TTSEngine.

Measures what a deployed server delivers per chip — full-size models
(reference configs, random init = identical FLOPs), 16 concurrent requests
of ~10 s utterances with one registered speaker, synthesized through the
staged bucketed pipeline. Reported as generated audio seconds per wall
second, batched (the batcher coalesces all 16 into one engine call) vs
sequential batch-1 (the reference's serving story: one exact-size utterance
at a time, /root/reference/inference.py).

Unlike benchmarks/common.timeit (device-compute timing), this measures the
END-TO-END wall time a client sees, host transfers and batching latency
included — the serving metric, not the kernel metric.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import report


def build_engine():
    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
    from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
    from edm_tts_tpu.models.tokenizer.audio_tokenizer import AudioTokenizer
    from edm_tts_tpu.serving import TTSEngine

    dtype = jnp.bfloat16
    codec_cfg = CodecConfig()
    s2a_cfg = S2AConfig(codec=codec_cfg)
    t2s_cfg = T2SConfig(
        hidden_size=384, main_encoder_num_layers=12, main_encoder_num_heads=8,
        main_encoder_dim_head=24, length_predictor_num_heads=8,
        length_predictor_dim_head=24,
    )
    rng = jax.random.PRNGKey(0)

    codec = Codec(codec_cfg, dtype=dtype)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 640, 1)))

    s2a = InjectionConformer(s2a_cfg, dtype=dtype)
    s2a_params = jax.jit(
        lambda r: s2a.init(
            r, jnp.zeros((1, 12, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(rng)
    s2a_params = {
        "params": {**s2a_params["params"], "codec": codec_params["params"]}
    }

    t2s = TextToSemantic(t2s_cfg, dtype=dtype)
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r, jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), bool),
            jnp.zeros((1, 32), bool), jnp.zeros((1, 8), jnp.int32),
            jnp.ones((1, 8), bool), jnp.ones((1,)),
            mask_rng=r, train=False,
        )
    )(rng)

    eng = TTSEngine.from_models(
        AudioTokenizer(codec, None), codec_params, None,
        s2a, s2a_params, t2s, t2s_params,
        pred_iters=16, s2a_steps=8, max_speech_len=576, length_bucket=64,
        batch_buckets=(1, 2, 4, 8, 16),
    )
    # 3 s speaker prompt as precomputed codes (serving path: offline dump)
    k1, k2 = jax.random.split(rng)
    eng.register_speaker_codes(
        "bench",
        jax.random.randint(k1, (1, 12, 150), 0, 1024),
        jax.random.randint(k2, (1, 150), 0, 1024),
    )
    return eng


def main():
    from edm_tts_tpu.serving import DynamicBatcher, Request

    eng = build_engine()
    n_req = 16
    gt = 500  # ~10 s per utterance at 50 Hz
    texts = [f"utterance number {i} with some padding text." for i in
             range(n_req)]

    # warm both compiled programs (batch-16 and batch-1 buckets)
    eng.synthesize(texts, "bench", seed=0, gt_lengths=[gt] * n_req)
    eng.synthesize(texts[:1], "bench", seed=0, gt_lengths=[gt])

    # --- batched serving: 16 concurrent requests, one coalesced call ------
    b = DynamicBatcher(eng.synthesize, max_batch=16, max_wait_ms=50)
    t0 = time.perf_counter()
    futs = [
        b.submit(Request(t, "bench", seed=1, gt_length=gt)) for t in texts
    ]
    wavs = [f.result(600) for f in futs]
    dt_batched = time.perf_counter() - t0
    b.close()
    audio_s = sum(w.shape[0] for w in wavs) / eng.sample_rate

    # --- sequential batch-1 (reference serving style) ----------------------
    t0 = time.perf_counter()
    for t in texts[:4]:
        eng.synthesize([t], "bench", seed=1, gt_lengths=[gt])
    dt_seq = (time.perf_counter() - t0) * (n_req / 4)

    report(
        "serving_audio_s_per_s_batched", audio_s / dt_batched, "audio-s/s",
        baseline=None,
    )
    report(
        "serving_audio_s_per_s_sequential", audio_s / dt_seq, "audio-s/s",
        baseline=None,
    )
    print(f"# {n_req} x {gt / 50:.0f}s requests: batched {dt_batched:.2f}s "
          f"wall, sequential (extrapolated from 4) {dt_seq:.2f}s wall")


if __name__ == "__main__":
    main()
