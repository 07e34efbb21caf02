"""HuBERT parity test: our flax implementation vs HF transformers (torch CPU)
with a small random config — weight-exact conversion, output tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edm_tts_tpu.models.hubert import (
    HUBERT_TINY_TEST,
    HubertModel,
    from_hf_state_dict,
    normalize_input,
)


def _tiny_hf_model():
    from transformers import HubertConfig as HFConfig
    from transformers import HubertModel as HFModel

    cfg = HFConfig(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    model = HFModel(cfg).eval()
    return model


@pytest.fixture(scope="module")
def models():
    hf = _tiny_hf_model()
    ours = HubertModel(HUBERT_TINY_TEST)
    params = from_hf_state_dict(HUBERT_TINY_TEST, hf.state_dict())
    return hf, ours, params


def test_hidden_states_match_hf(models):
    hf, ours, params = models
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 400)).astype(np.float32)

    with torch.no_grad():
        hf_out = hf(torch.from_numpy(audio), output_hidden_states=True)
    # layer-1 hidden states (pre-final-LN), the analog of hidden_states[18]
    theirs = hf_out.hidden_states[1].numpy()
    mine = np.asarray(
        jax.jit(lambda p, a: ours.apply(p, a, output_layer=1))(
            params, jnp.asarray(audio)
        )
    )
    np.testing.assert_allclose(mine, theirs, atol=2e-4, rtol=1e-3)

    # full forward (with final LN) == last_hidden_state
    full = np.asarray(jax.jit(ours.apply)(params, jnp.asarray(audio)))
    np.testing.assert_allclose(
        full, hf_out.last_hidden_state.numpy(), atol=2e-4, rtol=1e-3
    )


def test_attention_mask_parity(models):
    hf, ours, params = models
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 500)).astype(np.float32)
    mask = np.ones((2, 500), dtype=np.int64)
    mask[1, 350:] = 0
    audio[1, 350:] = 0.0

    with torch.no_grad():
        hf_out = hf(
            torch.from_numpy(audio),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    mine = np.asarray(
        jax.jit(lambda p, a, m: ours.apply(p, a, m, output_layer=1))(
            params, jnp.asarray(audio), jnp.asarray(mask)
        )
    )
    theirs = hf_out.hidden_states[1].numpy()
    # compare only valid frames of each sample
    valid1 = HUBERT_TINY_TEST.feature_lengths(350)
    np.testing.assert_allclose(mine[0], theirs[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        mine[1, :valid1], theirs[1, :valid1], atol=2e-4, rtol=1e-3
    )


def test_depth24_layer18_extraction_matches_hf():
    """Full-depth parity: a 24-layer (narrow) random HuBERT, extracting the
    intermediate layer-18 hidden states — the exact analog of the reference's
    ``hidden_states[18]`` tap (semantic_tokenizer_hubert.py:64-90). Depth
    compounds f32 drift; this pins the accumulated error at real depth."""
    from transformers import HubertConfig as HFConfig
    from transformers import HubertModel as HFModel

    from edm_tts_tpu.models.hubert.config import HubertConfig

    cfg = HubertConfig(
        conv_dim=(16, 16),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        hidden_size=64,
        num_hidden_layers=24,
        num_attention_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    hf_cfg = HFConfig(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=24,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=(16, 16),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(18)
    hf = HFModel(hf_cfg).eval()
    ours = HubertModel(cfg)
    params = from_hf_state_dict(cfg, hf.state_dict())

    rng = np.random.default_rng(3)
    audio = rng.standard_normal((2, 1600)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(torch.from_numpy(audio), output_hidden_states=True)
    theirs = hf_out.hidden_states[18].numpy()
    mine = np.asarray(
        jax.jit(lambda p, a: ours.apply(p, a, output_layer=18))(
            params, jnp.asarray(audio)
        )
    )
    np.testing.assert_allclose(mine, theirs, atol=1e-3, rtol=1e-2)


def test_kmeans_token_flip_rate_bf16_vs_f32():
    """Quantify the conversion risk the reference surface carries: how many
    semantic token ids flip when HuBERT runs in bf16 instead of f32
    (reference dumps under bf16 autocast, dump_tokens.py:213). Random weights
    are the worst case (features less separated than trained ones); the
    measured rate documents the tolerance for full-scale conversion."""
    from edm_tts_tpu.models.tokenizer.semantic_hubert import (
        SemanticTokenizerHubert,
    )

    hf = _tiny_hf_model()
    params32 = from_hf_state_dict(HUBERT_TINY_TEST, hf.state_dict())

    rng = np.random.default_rng(4)
    audio = jnp.asarray(rng.standard_normal((4, 4000)).astype(np.float32))
    centers = jnp.asarray(
        rng.standard_normal((64, HUBERT_TINY_TEST.hidden_size)).astype(np.float32)
    )

    tok32 = SemanticTokenizerHubert(HUBERT_TINY_TEST, output_layer=1)
    tok16 = SemanticTokenizerHubert(
        HUBERT_TINY_TEST, output_layer=1, dtype=jnp.bfloat16
    )
    p = tok32.make_params(params32, centers)
    ids32 = np.asarray(tok32.encode(p, audio))
    ids16 = np.asarray(tok16.encode(p, audio))
    flip_rate = float((ids32 != ids16).mean())
    assert flip_rate < 0.05, f"bf16 flips {flip_rate:.1%} of semantic tokens"


def test_normalize_input_matches_hf_feature_extractor():
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((1, 320)).astype(np.float32) * 3 + 1
    ours = np.asarray(normalize_input(jnp.asarray(audio)))
    m, v = audio.mean(), audio.var()
    theirs = (audio - m) / np.sqrt(v + 1e-7)
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)
