"""End-to-end zero-shot pipeline smoke test with tiny random-weight models:
export -> load -> tokenize prompt -> t2s sample -> s2a sample -> decode.
Covers the hub save/load surfaces and the full inference.py wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.hubert import HubertModel
from edm_tts_tpu.models.hubert.config import HUBERT_TINY_TEST
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


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    from edm_tts_tpu.models.hubert.config import HubertConfig
    from edm_tts_tpu.utils.hub import (
        build_audio_tokenizer,
        load_s2a,
        load_t2s,
        save_codec,
        save_hubert,
        save_s2a,
        save_t2s,
    )

    rng = jax.random.PRNGKey(0)

    # --- create + export tiny models -------------------------------------
    codec = Codec(TINY_CODEC)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 640, 1)))
    save_codec(str(tmp_path / "codec"), codec, codec_params)

    # hubert tiny: downsample 10; codec hop is 320 — for the joint tokenizer
    # test we only need the codec/semantic lengths to agree, so use a config
    # whose conv stack downsamples by 320 like the real one
    hub_cfg = HubertConfig(
        conv_dim=(8, 8, 8, 8, 8, 8, 8),
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=32,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    hub = HubertModel(hub_cfg)
    hub_params = jax.jit(hub.init)(rng, jnp.zeros((1, 1280)))
    centers = jax.random.normal(rng, (TINY_S2A.num_semantic_tokens, 16))
    save_hubert(str(tmp_path / "hubert"), hub_cfg, hub_params, centers)

    s2a = InjectionConformer(TINY_S2A)
    s2a_params = jax.jit(
        lambda r: s2a.init(
            r, jnp.zeros((1, 4, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(rng)
    s2a_params = {"params": {**s2a_params["params"], "codec": codec_params["params"]}}
    save_s2a(str(tmp_path / "s2a"), s2a, s2a_params)

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
    save_t2s(str(tmp_path / "t2s"), t2s, t2s_params)

    # --- reload everything ------------------------------------------------
    tokenizer, codec_params2, sem_params = build_audio_tokenizer(
        str(tmp_path / "codec"), str(tmp_path / "hubert")
    )
    s2a2, s2a_params2 = load_s2a(str(tmp_path / "s2a"))
    t2s2, t2s_params2 = load_t2s(str(tmp_path / "t2s"))
    assert dataclasses.asdict(s2a2.cfg) == dataclasses.asdict(TINY_S2A)

    # --- run the pipeline -------------------------------------------------
    wav = np.random.default_rng(0).standard_normal(3200).astype(np.float32) * 0.1
    prompt = tokenizer.compute_codes(codec_params2, sem_params, wav[None])
    assert prompt["acoustic_codes"].shape[-1] == prompt["semantic_codes"].shape[-1]
    tp = prompt["acoustic_codes"].shape[-1]
    assert tp == 3200 // 320

    # restrict prompt semantic ids to the tiny s2a vocab
    prompt_sem = prompt["semantic_codes"] % TINY_S2A.num_semantic_tokens

    text_tokens = jnp.asarray([[b + 5 for b in b"hello"]], jnp.int32)
    out = t2s_sample(
        t2s2, t2s_params2, text_tokens, jnp.asarray([5]), jax.random.PRNGKey(1),
        pred_iters=3, max_speech_len=12, gt_length=jnp.asarray([10]),
    )
    semantic = out["semantic_tokens"][:, :10]

    codes = s2a_sample(
        s2a2, s2a_params2, semantic,
        prompt["acoustic_codes"], prompt_sem,
        jax.random.PRNGKey(2), steps=2,
    )
    assert codes.shape == (1, TINY_CODEC.n_codebooks, 10)

    audio = s2a2.apply(s2a_params2, codes, method="decode_audio")
    assert audio.shape[1] >= 10 * 320
    assert np.isfinite(np.asarray(audio)).all()
