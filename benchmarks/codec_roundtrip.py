"""Driver config #1: codec encode/decode round-trip on one 10 s clip.

Measures full-size codec (12x1024 RVQ) encode->codes->decode wall time per
clip; reports the real-time factor (compute seconds per audio second).
"""

import jax
import jax.numpy as jnp

from common import report, timeit


def main():
    from edm_tts_tpu.models.codec import Codec, CodecConfig

    cfg = CodecConfig()
    codec = Codec(cfg, dtype=jnp.bfloat16)
    seconds = 10.0
    t = int(seconds * cfg.sample_rate)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(codec.init)(rng, jnp.zeros((1, cfg.hop_length, 1)))
    audio = jax.random.normal(rng, (1, t, 1), jnp.bfloat16) * 0.1

    encode = jax.jit(lambda p, a: codec.apply(p, a, method="encode_to_codes"))
    decode = jax.jit(lambda p, c: codec.apply(p, c, method="decode_from_codes"))

    def roundtrip(i):
        codes = encode(params, audio)
        return decode(params, codes)

    dt = timeit(roundtrip)
    report("codec_roundtrip_rtf", dt / seconds, "s_compute_per_s_audio")


if __name__ == "__main__":
    main()
