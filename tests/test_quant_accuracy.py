"""Quantization accuracy bounds: int8 / w8a8 logit fidelity vs bf16.

The serving layer ships ``--quantize_s2a w8a8`` (measured -25% batch-1 s2a
latency, benchmarks/README.md); these tests bound the numeric cost. The
yardstick is the bf16-vs-f32 error the *reference itself* accepts by running
inference under bf16 autocast (/root/reference/inference.py:33): quantized
single-forward logits must stay within a small multiple of that rounding
noise, and single-forward argmax decisions must agree at a pinned rate.

Why single-forward and not full-sampler token agreement: with random tiny
weights the MaskGIT logits are nearly flat, so ANY perturbation (including
bf16 rounding itself) flips near-tie argmaxes whose effects compound over
iterations — trajectory agreement measures chaos, not quantization quality
(measured here: even bf16-vs-f32 trajectories diverge). The per-forward
error is the quantity quantization actually controls; the full-size
characterization (greedy trajectory agreement + output mel distance at the
real model scale, where logit gaps are larger) lives in
scripts/quant_accuracy.py with results in benchmarks/README.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.quantize import quantize_s2a, quantize_t2s
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic


@pytest.fixture(scope="module")
def t2s_setup():
    cfg = T2SConfig(
        hidden_size=128, main_encoder_num_layers=2, main_encoder_num_heads=4,
        length_predictor_num_layers=1, length_predictor_num_heads=4,
    )
    model = TextToSemantic(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
        )
    )(rng)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 96), 0, 1285)
    att = jnp.ones((2, 96), bool)

    def logits_of(m, p):
        emb = m.apply(p, tokens, method=TextToSemantic.embed)
        return np.asarray(
            m.apply(p, emb, att, conv_pad_mask=att,
                    method=TextToSemantic.embeddings_to_logits),
            np.float32,
        )

    return cfg, model, params, logits_of


@pytest.fixture(scope="module")
def s2a_setup():
    codec_cfg = CodecConfig(encoder_dim=16, decoder_dim=128, n_codebooks=4,
                            codebook_size=64, codebook_dim=8)
    cfg = S2AConfig(
        hidden_size=128, encoder_num_heads=4, encoder_num_layers=4,
        injection_layers=(1, 2), encoder_attn_dropout=0.0,
        encoder_ff_dropout=0.0, encoder_conv_dropout=0.0, codec=codec_cfg,
    )
    model = InjectionConformer(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, 4, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(rng)
    codec = Codec(codec_cfg, dtype=jnp.bfloat16)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
    params = {"params": {**params["params"], "codec": codec_params["params"]}}
    semantic = jax.random.randint(jax.random.PRNGKey(5), (2, 64), 0, 1024)

    def logits_of(m, p):
        sem = m.apply(p, semantic, method=InjectionConformer.embed_semantic)
        mask_tok = m.apply(p, method=InjectionConformer.mask_token_value)
        return np.asarray(
            m.apply(p, sem + mask_tok, None,
                    method=InjectionConformer.forward_first_level),
            np.float32,
        )

    return cfg, model, params, logits_of


def _stats(a, b, scale):
    rms = float(np.sqrt(((a - b) ** 2).mean()) / scale)
    agree = float((a.argmax(-1) == b.argmax(-1)).mean())
    return rms, agree


@pytest.mark.parametrize("mode", ["int8", "w8a8"])
def test_t2s_quant_logit_fidelity(t2s_setup, mode):
    cfg, model, params, logits_of = t2s_setup
    lo16 = logits_of(model, params)
    lo32 = logits_of(TextToSemantic(cfg, dtype=jnp.float32), params)
    scale = np.abs(lo32).mean()
    rms_bf16, agree_bf16 = _stats(lo16, lo32, scale)

    mq, pq = quantize_t2s(model, params, mode=mode)
    rms_q, agree_q = _stats(logits_of(mq, pq), lo16, scale)
    # measured (seed 0): bf16-vs-f32 rms 0.017 agree 0.984;
    # int8 rms 0.031 agree 0.964; w8a8 rms 0.046 agree 0.943
    assert rms_q < 4.0 * rms_bf16, (
        f"{mode} logit rms {rms_q:.4f} vs bf16 rounding noise {rms_bf16:.4f}"
    )
    assert agree_q >= 0.90, f"{mode} argmax agreement {agree_q:.4f}"


@pytest.mark.parametrize("mode", ["int8", "w8a8"])
def test_s2a_quant_logit_fidelity(s2a_setup, mode):
    cfg, model, params, logits_of = s2a_setup
    lo16 = logits_of(model, params)
    lo32 = logits_of(InjectionConformer(cfg, dtype=jnp.float32), params)
    scale = np.abs(lo32).mean()
    rms_bf16, _ = _stats(lo16, lo32, scale)

    mq, pq = quantize_s2a(model, params, mode=mode)
    rms_q, agree_q = _stats(logits_of(mq, pq), lo16, scale)
    assert rms_q < 4.0 * rms_bf16, (
        f"{mode} logit rms {rms_q:.4f} vs bf16 rounding noise {rms_bf16:.4f}"
    )
    assert agree_q >= 0.90, f"{mode} argmax agreement {agree_q:.4f}"
