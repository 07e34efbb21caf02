"""Driver config #2: HuBERT-large + k-means + codec joint tokenization
throughput (the dump_tokens device hot loop) — audio seconds tokenized per
wall second, batch 8 x 10 s windows."""

import jax
import jax.numpy as jnp
import numpy as np

from common import report, timeit


def main():
    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.hubert import HUBERT_LARGE_LL60K, HubertModel
    from edm_tts_tpu.models.tokenizer import (
        AudioTokenizer,
        SemanticTokenizerHubert,
    )

    batch, seconds = 8, 10.0
    codec_cfg = CodecConfig()
    codec = Codec(codec_cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 640, 1)))

    sem = SemanticTokenizerHubert(HUBERT_LARGE_LL60K, dtype=jnp.bfloat16)
    hub_params = jax.jit(HubertModel(HUBERT_LARGE_LL60K, dtype=jnp.bfloat16).init)(
        rng, jnp.zeros((1, 3200))
    )
    sem_params = sem.make_params(hub_params, np.zeros((1024, 1024), np.float32))

    tok = AudioTokenizer(codec, sem)
    t = int(seconds * 16000) + 160  # pad-hack shape
    audio = jax.random.normal(rng, (batch, t)) * 0.1
    mask = jnp.ones((batch, t), jnp.int32)

    dt = timeit(
        lambda i: tok.compute_codes_batch(
            codec_params, sem_params, audio, audio, mask
        )["semantic_codes"],
        n=3,
    )
    report("tokenize_throughput", batch * seconds / dt, "audio_s_per_wall_s")


if __name__ == "__main__":
    main()
