"""Differential parity: flax TextToSemantic vs the reference torch model.

Instantiates the reference ``TextToSemanticWLen``
(modeling_text_to_semantic.py:27-62) with a tiny random-init config on CPU,
imports the weights via ``models/t2s/convert.from_torch_state_dict``, and
asserts forward logits, layer features and length prediction match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
from edm_tts_tpu.models.t2s.convert import from_torch_state_dict
from reference_torch import install_reference_path

install_reference_path()

from edm_tts.models.text_to_semantic.configuration import (  # noqa: E402
    TextToSemanticWLenConfig,
)
from edm_tts.models.text_to_semantic.modeling_text_to_semantic import (  # noqa: E402
    TextToSemanticWLen,
)

H, V_SEM, V_TXT = 32, 24, 16


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref_cfg = TextToSemanticWLenConfig(
        hidden_size=H,
        semantic_vocab_size=V_SEM,
        text_vocab_size=V_TXT,
        main_encoder_num_heads=4,
        main_encoder_num_layers=2,
        main_encoder_ff_mult=2,
        length_predictor_num_heads=4,
        length_predictor_num_layers=1,
        length_predictor_ff_mult=2,
        attn_flash=False,
    )
    ref = TextToSemanticWLen(ref_cfg).eval()
    cfg = T2SConfig(
        hidden_size=H,
        semantic_vocab_size=V_SEM,
        text_vocab_size=V_TXT,
        main_encoder_num_heads=4,
        main_encoder_num_layers=2,
        main_encoder_ff_mult=2,
        length_predictor_num_heads=4,
        length_predictor_num_layers=1,
        length_predictor_ff_mult=2,
    )
    model = TextToSemantic(cfg)
    variables = jax.tree.map(jnp.asarray, from_torch_state_dict(cfg, ref.state_dict()))
    return ref, model, variables, cfg


@pytest.fixture(scope="module")
def token_batch(pair):
    """Joint [TEXT] bytes [SEP] [SPEECH] sem [SEP] rows with right padding."""
    _, _, _, cfg = pair
    rng = np.random.default_rng(0)
    b, l = 2, 20
    ids = np.zeros((b, l), np.int64)
    attn = np.zeros((b, l), bool)
    for i, (n_text, n_speech) in enumerate([(4, 10), (5, 8)]):
        row = (
            [1]
            + list(rng.integers(5, 5 + V_TXT, n_text))
            + [3, 2]
            + list(rng.integers(5 + V_TXT, 5 + V_TXT + V_SEM, n_speech))
            + [3]
        )
        ids[i, : len(row)] = row
        attn[i, : len(row)] = True
    return ids, attn


def test_embeddings_to_logits_parity(pair, token_batch):
    ref, model, variables, _ = pair
    ids, attn = token_batch
    with torch.no_grad():
        emb = ref.input_embedding(torch.from_numpy(ids))
        ref_logits = ref.embeddings_to_logits(
            emb, attention_mask=torch.from_numpy(attn)
        ).numpy()
    mine = np.asarray(
        jax.jit(
            lambda v, i, a: model.apply(
                v,
                model.bind(v).embed(jnp.asarray(i)),
                a,
                method=TextToSemantic.embeddings_to_logits,
            )
        )(variables, jnp.asarray(ids), jnp.asarray(attn))
    )
    np.testing.assert_allclose(mine, ref_logits, atol=5e-4, rtol=1e-3)


def test_extract_features_parity(pair, token_batch):
    ref, model, variables, _ = pair
    ids, attn = token_batch
    for layer_idx in (0, None):
        with torch.no_grad():
            ref_feats, _ = ref.extract_features(
                torch.from_numpy(ids),
                attention_mask=torch.from_numpy(attn),
                output_layer_idx=layer_idx,
            )
        mine = np.asarray(
            jax.jit(
                lambda v, i, a, li=layer_idx: model.apply(
                    v, i, a, li, method=TextToSemantic.extract_features
                )
            )(variables, jnp.asarray(ids), jnp.asarray(attn))
        )
        np.testing.assert_allclose(mine, ref_feats.numpy(), atol=5e-4, rtol=1e-3)


def test_length_prediction_parity(pair):
    """predict_log_length vs the reference length-predictor composition
    (modeling_text_to_semantic.py:117-124 / infer :199-203)."""
    ref, model, variables, _ = pair
    rng = np.random.default_rng(1)
    text_ids = rng.integers(5, 5 + V_TXT, (2, 6)).astype(np.int64)
    text_ids[1, 4:] = 0  # padded tail
    text_mask = text_ids != 0
    with torch.no_grad():
        t_ids = torch.from_numpy(text_ids)
        t_mask = torch.from_numpy(text_mask)
        emb = ref.input_embedding(t_ids)
        inp = torch.cat([ref.length_token.expand(2, -1, -1), emb], dim=1)
        full_mask = torch.cat([torch.ones(2, 1, dtype=torch.bool), t_mask], dim=1)
        out, *_ = ref.length_predictor(inp, mask=full_mask, return_attn=False)
        ref_pred = ref.length_pred_head(out[:, 0]).squeeze(-1).numpy()
    mine = np.asarray(
        jax.jit(
            lambda v, i, m: model.apply(
                v, i, m, method=TextToSemantic.predict_log_length
            )
        )(variables, jnp.asarray(text_ids), jnp.asarray(text_mask))
    )
    np.testing.assert_allclose(mine, ref_pred, atol=5e-4, rtol=1e-3)
