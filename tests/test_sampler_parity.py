"""Differential sampler parity: our jitted lax.scan MaskGIT samplers vs the
reference's actual Python sampling loops, run end to end on the same
converted weights.

Both sides are made fully deterministic the same way:
- greedy token draws — torch ``Categorical.sample`` is patched to argmax on
  the reference side, ``greedy=True`` selects ``jnp.argmax`` on ours;
- ``temperature=0.0`` — the reference's ``random_topk_mask`` computes
  ``log(probs) + temperature * gumbel`` (utils.py:49-60), so the gumbel term
  vanishes and the re-masking top-k is deterministic on both sides.

With identical weights (via models/{t2s,s2a}/convert) the two loops must
then emit EXACTLY the same token ids at every position:
- t2s: ``TextToSemanticWLen.infer`` (modeling_text_to_semantic.py:184-266)
  vs ``t2s_sample`` — including the final whole-span argmax overwrite;
- s2a: ``InjectionConformerModel.infer_special``
  (modeling_injection_conformer.py:130-230) vs ``s2a_sample`` — with and
  without a speaker prompt, including the +inf confidence carry and the
  ``min(sum(mask)-1, ·)`` clamp.

This upgrades the sampler parity claims from "logits match per forward"
(test_convert_{t2s,s2a}.py) to "the whole iterative decode matches".
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edm_tts_tpu.models.codec import CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.s2a.convert import from_torch_state_dict as s2a_convert
from edm_tts_tpu.models.s2a.sampler import s2a_sample
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
from edm_tts_tpu.models.t2s.convert import from_torch_state_dict as t2s_convert
from edm_tts_tpu.models.t2s.sampler import t2s_sample
from reference_torch import install_reference_path

install_reference_path()

from edm_tts.models.dac.configuration import DACConfig  # noqa: E402
from edm_tts.models.dac.modeling_dac import DAC  # noqa: E402
from edm_tts.models.injection_conformer.configuration import (  # noqa: E402
    InjectionConformerConfig,
)
from edm_tts.models.injection_conformer.modeling_injection_conformer import (  # noqa: E402
    InjectionConformerModel,
)
from edm_tts.models.text_to_semantic.configuration import (  # noqa: E402
    TextToSemanticWLenConfig,
)
from edm_tts.models.text_to_semantic.modeling_text_to_semantic import (  # noqa: E402
    TextToSemanticWLen,
)


class _GreedyCategorical:
    """Stand-in for torch Categorical whose sample() is argmax — the greedy
    patch that makes the reference loops deterministic."""

    def __init__(self, logits=None, probs=None):
        assert logits is not None
        self._logits = logits

    def sample(self, sample_shape=torch.Size()):
        return self._logits.argmax(-1)


@pytest.fixture()
def greedy_torch(monkeypatch):
    monkeypatch.setattr(
        torch.distributions.categorical, "Categorical", _GreedyCategorical
    )


# ---------------------------------------------------------------- t2s


@pytest.fixture(scope="module")
def t2s_pair():
    torch.manual_seed(1)
    kw = dict(
        hidden_size=32,
        semantic_vocab_size=24,
        text_vocab_size=16,
        main_encoder_num_heads=4,
        main_encoder_num_layers=2,
        main_encoder_ff_mult=2,
        length_predictor_num_heads=4,
        length_predictor_num_layers=1,
        length_predictor_ff_mult=2,
    )
    ref = TextToSemanticWLen(
        TextToSemanticWLenConfig(attn_flash=False, **kw)
    ).eval()
    cfg = T2SConfig(**kw)
    model = TextToSemantic(cfg)
    variables = jax.tree.map(jnp.asarray, t2s_convert(cfg, ref.state_dict()))
    return ref, model, variables


@pytest.mark.parametrize("pred_iters,gt_len", [(4, 7), (6, 5), (1, 4)])
def test_t2s_decode_parity(t2s_pair, greedy_torch, pred_iters, gt_len):
    ref, model, variables = t2s_pair
    # bytes must stay < text_vocab_size (16) for the tiny joint vocab
    text = "\x01\x05\x0a\x03\x02"
    with torch.no_grad():
        out = ref.infer(
            text, pred_iters=pred_iters, temperature=0.0, gt_length=gt_len
        )
    ref_tokens = out.speech_pred_tokens.numpy()  # raw semantic ids, (gt_len,)
    assert ref_tokens.shape == (gt_len,)

    text_tokens = jnp.asarray(
        [list(text.encode("utf-8"))], jnp.int32
    ) + model.cfg.num_special_tokens
    mine = t2s_sample(
        model,
        variables,
        text_tokens,
        jnp.asarray([len(text)], jnp.int32),
        jax.random.PRNGKey(0),  # consumed but multiplied away at T=0
        pred_iters=pred_iters,
        temperature=0.0,
        max_speech_len=12,
        gt_length=jnp.asarray([gt_len], jnp.int32),
        greedy=True,
    )
    assert int(mine["lengths"][0]) == gt_len
    my_tokens = np.asarray(mine["semantic_tokens"][0, :gt_len])
    np.testing.assert_array_equal(my_tokens, ref_tokens)


# ---------------------------------------------------------------- s2a

H, Q, N, V_SEM = 32, 4, 16, 24


@pytest.fixture(scope="module")
def s2a_pair():
    torch.manual_seed(0)
    dac_cfg = DACConfig(
        encoder_dim=8,
        encoder_rates=[2, 4, 5, 8],
        decoder_dim=96,
        decoder_rates=[8, 5, 4, 2],
        n_codebooks=Q,
        codebook_size=N,
        codebook_dim=4,
        quantizer_dropout=0.0,
    )
    tmp = tempfile.mkdtemp()
    DAC(dac_cfg).save_pretrained(tmp)
    ref = InjectionConformerModel(
        InjectionConformerConfig(
            hidden_size=H,
            num_semantic_tokens=V_SEM,
            acoustic_model_path=tmp,
            encoder_num_heads=4,
            encoder_num_layers=4,
            encoder_ff_mult=2,
            encoder_attn_dropout=0.0,
            encoder_ff_dropout=0.0,
            encoder_conv_dropout=0.0,
            injection_layers=(1, 2),
            attn_flash=False,
        )
    ).eval()
    cfg = S2AConfig(
        hidden_size=H,
        num_semantic_tokens=V_SEM,
        encoder_num_heads=4,
        encoder_num_layers=4,
        encoder_ff_mult=2,
        encoder_attn_dropout=0.0,
        encoder_ff_dropout=0.0,
        encoder_conv_dropout=0.0,
        injection_layers=(1, 2),
        codec=CodecConfig(
            encoder_dim=8,
            decoder_dim=96,
            n_codebooks=Q,
            codebook_size=N,
            codebook_dim=4,
            quantizer_dropout=0.0,
        ),
    )
    model = InjectionConformer(cfg)
    variables = jax.tree.map(jnp.asarray, s2a_convert(cfg, ref.state_dict()))
    return ref, model, variables


@pytest.mark.parametrize("with_prompt", [True, False])
def test_s2a_decode_parity(s2a_pair, greedy_torch, with_prompt):
    ref, model, variables = s2a_pair
    rng = np.random.default_rng(2)
    b, t, tp, steps = 2, 10, 4, 4
    sem = rng.integers(0, V_SEM, (b, t)).astype(np.int64)
    if with_prompt:
        ac_prompt = rng.integers(0, N, (b, Q, tp)).astype(np.int64)
        sem_prompt = rng.integers(0, V_SEM, (b, tp)).astype(np.int64)
        ref_args = (
            torch.from_numpy(ac_prompt),
            torch.from_numpy(sem_prompt),
        )
        my_args = (jnp.asarray(ac_prompt), jnp.asarray(sem_prompt))
    else:
        ref_args = (None, None)
        my_args = (None, None)

    with torch.no_grad():
        ref_codes = ref.infer_special(
            torch.from_numpy(sem), *ref_args, steps=steps, temperature=0.0
        ).numpy()  # (B, Q, T)

    mine = np.asarray(
        s2a_sample(
            model,
            variables,
            jnp.asarray(sem),
            *my_args,
            jax.random.PRNGKey(0),
            steps=steps,
            temperature=0.0,
            greedy=True,
        )
    )
    assert mine.shape == ref_codes.shape == (b, Q, t)
    np.testing.assert_array_equal(mine, ref_codes)
