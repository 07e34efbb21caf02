"""Driver config #3: batched text->semantic inference, batch 16, 16 iters."""

import jax
import jax.numpy as jnp

from common import report, timeit


def main():
    from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic, t2s_sample

    batch, text_len, speech_len = 16, 100, 500
    cfg = T2SConfig(hidden_size=384, main_encoder_num_layers=12,
                 main_encoder_num_heads=8, main_encoder_dim_head=24,
                length_predictor_num_heads=8, length_predictor_dim_head=24)
    model = TextToSemantic(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
        )
    )(rng)

    text = jax.random.randint(rng, (batch, text_len), 5, 261)
    tl = jnp.full((batch,), text_len, jnp.int32)
    gt = jnp.full((batch,), speech_len, jnp.int32)

    dt = timeit(
        lambda i: t2s_sample(model, params, text, tl, jax.random.PRNGKey(i),
                             pred_iters=16, max_speech_len=speech_len,
                             gt_length=gt)["semantic_tokens"],
        n=3,
    )
    audio_seconds = batch * speech_len / 50.0
    report("t2s_inference_throughput", audio_seconds / dt,
           "audio_s_per_wall_s_batch16_iters16")


if __name__ == "__main__":
    main()
