"""Batched full zero-shot pipeline (LibriLight-scale batch): t2s -> s2a ->
decode for a batch of utterances sharing one speaker prompt (prompt broadcast
as in inference.py batch mode), fused into one device program. Reports
generated audio seconds per wall second per chip — the serving-throughput
view of driver config #5 (bench.py is the latency view at batch 1)."""

import jax
import jax.numpy as jnp

from common import report, timeit


def main():
    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
    from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
    from edm_tts_tpu.pipeline import e2e_synthesize

    dtype = jnp.bfloat16
    batch, t_gen, t_prompt, text_len = 16, 500, 150, 100

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

    text_tokens = jax.random.randint(rng, (batch, text_len), 5, 261)
    text_lengths = jnp.full((batch,), text_len, jnp.int32)
    prompt_ac = jax.random.randint(rng, (1, 12, t_prompt), 0, 1024)
    prompt_sem = jax.random.randint(rng, (1, t_prompt), 0, 1024)
    gt_length = jnp.full((batch,), t_gen, jnp.int32)

    def run(i):
        return e2e_synthesize(
            t2s, s2a, t2s_params, s2a_params, text_tokens, text_lengths,
            prompt_ac, prompt_sem, jax.random.PRNGKey(i),
            pred_iters=16, steps=8, max_speech_len=t_gen, gt_length=gt_length,
            assume_full_canvas=True,
        )["lengths"]  # tiny host transfer; audio stays on device

    dt = timeit(run, n=5)
    audio_seconds = batch * t_gen / 50.0
    report("e2e_batched_throughput", audio_seconds / dt,
           "audio_s_per_wall_s_batch16")


if __name__ == "__main__":
    main()
