"""Driver config #4: injection-Conformer semantic->acoustic sampling,
32-step sampler, batch 32 (BASELINE.md target: >=10x faster than the torch
reference at equal NFE; with no runnable reference here we report absolute
throughput — generated audio seconds per wall second across the batch)."""

import jax
import jax.numpy as jnp

from common import report, timeit


def main():
    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig, s2a_sample

    batch, t_gen, t_prompt, steps = 32, 500, 150, 32
    cfg = S2AConfig(codec=CodecConfig())
    model = InjectionConformer(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 12, 8), jnp.int32),
                             jnp.zeros((1, 8), jnp.int32), mask_rng=r,
                             train=False)
    )(rng)
    codec = Codec(cfg.codec, dtype=jnp.bfloat16)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
    params = {"params": {**params["params"], "codec": codec_params["params"]}}

    sem = jax.random.randint(rng, (batch, t_gen), 0, 1024)
    pa = jax.random.randint(rng, (batch, 12, t_prompt), 0, 1024)
    ps = jax.random.randint(rng, (batch, t_prompt), 0, 1024)

    dt = timeit(
        lambda i: s2a_sample(model, params, sem, pa, ps,
                             jax.random.PRNGKey(i), steps=steps),
        n=3,
    )
    audio_seconds = batch * t_gen / 50.0
    report("s2a_sampling_throughput", audio_seconds / dt,
           "audio_s_per_wall_s_batch32_steps32")


if __name__ == "__main__":
    main()
