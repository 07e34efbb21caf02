"""Decoder hot-path analysis with on-device iteration (tunnel-transfer-free)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec.decoder import Decoder, DecoderBlock
from edm_tts_tpu.models.codec.layers import ResidualUnit, Snake, WNConv1d

dtype = jnp.bfloat16
rng = jax.random.PRNGKey(0)
T = 500
N = 20


def bench(name, module, x):
    params = jax.jit(module.init)(rng, x)

    @jax.jit
    def many(x):
        def body(i, acc):
            out = module.apply(params, x + (acc * 1e-9).astype(x.dtype))
            return jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

    _ = float(many(x))
    t0 = time.perf_counter()
    _ = float(many(x))
    print(f"{name}: {(time.perf_counter() - t0) / N * 1e3:.2f} ms", flush=True)


z = jax.random.normal(rng, (1, T, 1024), dtype)
bench("full decoder", Decoder(1536, (8, 5, 4, 2), dtype=dtype), z)
bench("stem 1024->1536 k7 @500", WNConv1d(1536, 7, padding=3, dtype=dtype), z)
bench("block s8 1536->768 @500", DecoderBlock(768, 8, dtype=dtype),
      jax.random.normal(rng, (1, T, 1536), dtype))
bench("block s5 768->384 @4k", DecoderBlock(384, 5, dtype=dtype),
      jax.random.normal(rng, (1, 8 * T, 768), dtype))
bench("block s4 384->192 @20k", DecoderBlock(192, 4, dtype=dtype),
      jax.random.normal(rng, (1, 40 * T + 2, 384), dtype))
bench("block s2 192->96 @80k", DecoderBlock(96, 2, dtype=dtype),
      jax.random.normal(rng, (1, 160 * T + 8, 192), dtype))
bench("final k7 96->1 @160k", WNConv1d(1, 7, padding=3, dtype=dtype),
      jax.random.normal(rng, (1, 320 * T + 16, 96), dtype))
bench("one resunit 96 @160k", ResidualUnit(96, dilation=9, dtype=dtype),
      jax.random.normal(rng, (1, 320 * T + 16, 96), dtype))
bench("snake 96 @160k", Snake(),
      jax.random.normal(rng, (1, 320 * T + 16, 96), dtype))
bench("plain conv k7 96ch @160k",
      WNConv1d(96, 7, padding=3, dtype=dtype),
      jax.random.normal(rng, (1, 320 * T + 16, 96), dtype))
