"""End-to-end zero-shot synthesis benchmark on the real chip.

Measures the full pipeline at reference scale and NFE (BASELINE.md):
t2s MaskGIT sampling (16 iters, d=384 12-layer Conformer) -> s2a sampling
(8 level-0 steps + one full 16-layer d=1024 injection pass, with a 3 s
speaker prompt = 150 tokens) -> codec decode of 10 s of audio — randomly
initialized weights (identical FLOPs/memory to trained ones), bf16, batch 1.

Prints ONE JSON line: metric=e2e_rtf_per_chip (wall seconds of compute per
second of generated audio; lower is better). vs_baseline is the BASELINE.md
target RTF 0.05 divided by the measured RTF (>1 == beating the target).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    import numpy as np

    from edm_tts_tpu.models.codec import CodecConfig
    from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
    from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic

    dtype = jnp.bfloat16

    gen_seconds = 10.0
    t_gen = int(gen_seconds * 50)  # 50 Hz tokens
    t_prompt = 150  # 3 s speaker prompt
    text_len = 100

    codec_cfg = CodecConfig()
    s2a_cfg = S2AConfig(codec=codec_cfg)
    # t2s at the reference train-yaml size: hidden 384, 12 main layers
    t2s_cfg = T2SConfig(hidden_size=384, main_encoder_num_layers=12,
                 main_encoder_num_heads=8, main_encoder_dim_head=24,
                length_predictor_num_heads=8, length_predictor_dim_head=24)

    rng = jax.random.PRNGKey(0)
    s2a = InjectionConformer(s2a_cfg, dtype=dtype)
    t2s = TextToSemantic(t2s_cfg, dtype=dtype)

    s2a_params = jax.jit(
        lambda r: s2a.init(
            r,
            jnp.zeros((1, 12, 8), jnp.int32),
            jnp.zeros((1, 8), jnp.int32),
            mask_rng=r,
            train=False,
        )
    )(rng)
    # graft full codec params (decoder included) — the s2a training init only
    # traces the quantizer; real flows load the codec checkpoint the same way
    from edm_tts_tpu.models.codec import Codec

    codec = Codec(codec_cfg, dtype=dtype)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
    s2a_params = {
        "params": {**s2a_params["params"], "codec": codec_params["params"]}
    }
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r,
            jnp.zeros((1, 16), jnp.int32),
            jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool),
            jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool),
            jnp.ones((1,)),
            mask_rng=r,
            train=False,
        )
    )(rng)

    text_tokens = jax.random.randint(rng, (1, text_len), 5, 261)
    text_lengths = jnp.asarray([text_len], jnp.int32)
    prompt_ac = jax.random.randint(rng, (1, 12, t_prompt), 0, 1024)
    prompt_sem = jax.random.randint(rng, (1, t_prompt), 0, 1024)
    gt_length = jnp.asarray([t_gen], jnp.int32)

    from edm_tts_tpu.pipeline import e2e_synthesize

    def pipeline(key):
        # ONE device dispatch: t2s -> s2a -> decode fused into a single
        # jitted program (edm_tts_tpu/pipeline.py), no host syncs between
        # stages. Saves ~2 tunnel dispatches (~4 ms each) per utterance.
        out = e2e_synthesize(
            t2s, s2a, t2s_params, s2a_params, text_tokens, text_lengths,
            prompt_ac, prompt_sem, key,
            pred_iters=16, steps=8, max_speech_len=t_gen, gt_length=gt_length,
            assume_full_canvas=True,
        )
        return out["audio"]

    # warmup / compile. NOTE: force a host transfer (np.asarray) rather than
    # block_until_ready — the axon TPU backend's block_until_ready does not
    # actually synchronize, which under-reports wall time ~100x.
    audio = np.asarray(pipeline(jax.random.PRNGKey(1)))

    # Sustained per-utterance compute: queue all dispatches back-to-back and
    # force completion once at the end with a single host transfer. Per-run
    # np.asarray timing measured the tunnel (~4 ms dispatch + 640 KB pull,
    # +-30 ms congestion swings), not the chip; amortizing over the batch
    # brings run-to-run spread under 5%. Device compute serializes across
    # queued dispatches, so wall/n == per-utterance compute.
    n_runs = 15
    t0 = time.perf_counter()
    outs = [pipeline(jax.random.PRNGKey(2 + i)) for i in range(n_runs)]
    _ = np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / n_runs

    rtf = dt / gen_seconds
    target = 0.05
    print(
        json.dumps(
            {
                "metric": "e2e_rtf_per_chip",
                "value": round(rtf, 5),
                "unit": "s_compute_per_s_audio",
                "vs_baseline": round(target / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
