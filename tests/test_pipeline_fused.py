"""Fused one-dispatch pipeline (edm_tts_tpu/pipeline.py) correctness:

1. padded-canvas s2a == exact-size s2a at valid positions (the pad_mask
   threading through attention + conv makes them bit-identical);
2. the fused e2e program reproduces the staged t2s->s2a->decode path exactly
   (same PRNG splits, same ops, one jit).
"""

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig, s2a_sample
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic, t2s_sample

TINY_CODEC = CodecConfig(
    encoder_dim=4, decoder_dim=32, n_codebooks=4, codebook_size=16,
    codebook_dim=4, quantizer_dropout=0.0,
)
TINY_S2A = S2AConfig(
    hidden_size=32, num_semantic_tokens=8, encoder_num_heads=4,
    encoder_num_layers=4, injection_layers=(1, 2),
    encoder_attn_dropout=0.0, encoder_ff_dropout=0.0, encoder_conv_dropout=0.0,
    codec=TINY_CODEC,
)
TINY_T2S = T2SConfig(
    hidden_size=32, semantic_vocab_size=8, main_encoder_num_heads=4,
    main_encoder_num_layers=1, length_predictor_num_heads=4,
    length_predictor_num_layers=1,
)


def _s2a_with_codec(rng):
    s2a = InjectionConformer(TINY_S2A)
    params = jax.jit(
        lambda r: s2a.init(
            r, jnp.zeros((1, 4, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(rng)
    codec = Codec(TINY_CODEC)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 640, 1)))
    params = {"params": {**params["params"], "codec": codec_params["params"]}}
    return s2a, params


def test_padded_s2a_matches_exact_canvas():
    """steps=1 (deterministic argmax path): codes at valid positions on a
    padded canvas with semantic_valid must equal the exact-size run."""
    rng = jax.random.PRNGKey(0)
    s2a, params = _s2a_with_codec(rng)
    n = 10
    sem = jax.random.randint(jax.random.PRNGKey(1), (2, n), 0, 8)
    prompt_ac = jax.random.randint(jax.random.PRNGKey(2), (2, 4, 4), 0, 16)
    prompt_sem = jax.random.randint(jax.random.PRNGKey(3), (2, 4), 0, 8)

    exact = s2a_sample(
        s2a, params, sem, prompt_ac, prompt_sem, jax.random.PRNGKey(4), steps=1
    )
    pad = 6
    sem_p = jnp.pad(sem, ((0, 0), (0, pad)))
    valid = jnp.arange(n + pad)[None, :] < n
    padded = s2a_sample(
        s2a, params, sem_p, prompt_ac, prompt_sem, jax.random.PRNGKey(4),
        steps=1, semantic_valid=jnp.broadcast_to(valid, (2, n + pad)),
    )
    np.testing.assert_array_equal(
        np.asarray(exact), np.asarray(padded)[:, :, :n]
    )


def test_padded_first_level_logits_match_exact():
    """The sampled loop's forward (forward_first_level) is also exact on a
    padded canvas at valid positions."""
    rng = jax.random.PRNGKey(0)
    s2a, params = _s2a_with_codec(rng)
    n, pad = 9, 7
    x = jax.random.normal(jax.random.PRNGKey(5), (2, n, 32))

    exact = s2a.apply(params, x, method=InjectionConformer.forward_first_level)
    x_p = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    valid = jnp.broadcast_to(jnp.arange(n + pad)[None, :] < n, (2, n + pad))
    padded = s2a.apply(
        params, x_p, valid, method=InjectionConformer.forward_first_level
    )
    np.testing.assert_allclose(
        np.asarray(exact), np.asarray(padded)[:, :n], atol=1e-5, rtol=1e-5
    )


def test_fused_e2e_matches_staged():
    from edm_tts_tpu.pipeline import e2e_synthesize

    rng = jax.random.PRNGKey(0)
    s2a, s2a_params = _s2a_with_codec(rng)
    t2s = TextToSemantic(TINY_T2S)
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r,
            jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)),
            mask_rng=r, train=False,
        )
    )(rng)

    text = jnp.asarray([[b + 5 for b in b"hello"]], jnp.int32)
    text_len = jnp.asarray([5], jnp.int32)
    prompt_ac = jax.random.randint(jax.random.PRNGKey(2), (1, 4, 4), 0, 16)
    prompt_sem = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 0, 8)
    key = jax.random.PRNGKey(7)
    msl = 12
    gt = jnp.asarray([msl], jnp.int32)  # full canvas

    fused = e2e_synthesize(
        t2s, s2a, t2s_params, s2a_params, text, text_len,
        prompt_ac, prompt_sem, key,
        pred_iters=3, steps=2, max_speech_len=msl, gt_length=gt,
    )

    # staged path, same PRNG splits as the fused program
    k_t2s, k_s2a = jax.random.split(key)
    t2s_out = t2s_sample(
        t2s, t2s_params, text, text_len, k_t2s,
        pred_iters=3, max_speech_len=msl, gt_length=gt,
    )
    codes = s2a_sample(
        s2a, s2a_params, t2s_out["semantic_tokens"], prompt_ac, prompt_sem,
        k_s2a, steps=2, semantic_valid=t2s_out["valid"],
    )
    audio = s2a.apply(s2a_params, codes, method=InjectionConformer.decode_audio)

    assert np.asarray(fused["lengths"])[0] == msl
    # token decisions are bit-identical (same keys, same ops)
    np.testing.assert_array_equal(
        np.asarray(fused["semantic_tokens"]), np.asarray(t2s_out["semantic_tokens"])
    )
    np.testing.assert_array_equal(
        np.asarray(fused["acoustic_codes"]), np.asarray(codes)
    )
    # waveform matches up to XLA cross-stage fusion reassociation (~1e-7)
    np.testing.assert_allclose(
        np.asarray(fused["audio"]), np.asarray(audio), atol=1e-5
    )
    assert np.isfinite(np.asarray(fused["audio"])).all()
