"""Differential training-objective parity: our jitted training forwards vs
the reference torch models' own ``forward`` losses, on converted weights
with the SAME cosine-schedule mask injected on both sides.

This closes the last gap between "per-forward logits match"
(test_convert_{t2s,s2a}.py) and "the optimized objective matches": the CE
reduction semantics (global masked mean), the t2s ignore-semantic-0 quirk
(reference ``CrossEntropyLoss(ignore_index=0)`` on RAW semantic targets,
modeling_text_to_semantic.py:60,131-134), the log-space L1 length loss, and
the s2a teacher-injection branch (wrapper.py:113-117) are all exercised
through the reference's actual code path — only the stochastic mask draw is
pinned (``cosine_schedule_mask`` patched on the torch side, ``mask_override``
on ours).
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
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
from edm_tts_tpu.models.t2s.convert import from_torch_state_dict as t2s_convert
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

# ---------------------------------------------------------------- t2s

H, V_SEM, V_TXT = 32, 24, 16


def test_t2s_training_loss_parity():
    torch.manual_seed(4)
    kw = dict(
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
    ref = TextToSemanticWLen(
        TextToSemanticWLenConfig(attn_flash=False, **kw)
    ).eval()
    cfg = T2SConfig(**kw)
    model = TextToSemantic(cfg)
    variables = jax.tree.map(jnp.asarray, t2s_convert(cfg, ref.state_dict()))

    # joint [TEXT] text [SEP] [SPEECH] sem [SEP] rows with right padding;
    # row 0's speech includes raw semantic id 0 (joint 21) at a masked
    # position to exercise the reference ignore_index=0 quirk
    rng = np.random.default_rng(5)
    b, l = 2, 20
    texts = [[6, 8, 15, 7], [9, 6, 11, 13, 10]]
    speeches = [
        [21, 25, 30, 40, 21, 33, 28, 26, 35, 22],  # raw ids 0.. (offset 21)
        [27, 31, 44, 21, 29, 38, 24, 41],
    ]
    row_masks = [
        [True, True, False, True, True, False, True, False, True, True],
        [True, False, True, True, False, True, True, False],
    ]
    ids = np.zeros((b, l), np.int64)
    attn = np.zeros((b, l), bool)
    speech_mask = np.zeros((b, l), bool)
    full_mask = np.zeros((b, l), bool)
    text_ids = np.zeros((b, max(len(t) for t in texts)), np.int64)
    for i, (txt, sp, m) in enumerate(zip(texts, speeches, row_masks)):
        row = [1] + txt + [3, 2] + sp + [3]
        ids[i, : len(row)] = row
        attn[i, : len(row)] = True
        s0 = 3 + len(txt)
        speech_mask[i, s0 : s0 + len(sp)] = True
        full_mask[i, s0 : s0 + len(sp)] = m
        text_ids[i, : len(txt)] = txt

    # pin the reference's per-row mask draw (prep calls it once per row,
    # modeling_text_to_semantic.py:96, in batch order)
    pending = [torch.tensor(m) for m in row_masks]
    ref.cosine_schedule_mask = lambda n: pending.pop(0)

    with torch.no_grad():
        out = ref(torch.from_numpy(ids), torch.from_numpy(attn))

    mine = jax.jit(
        lambda v: model.apply(
            v,
            jnp.asarray(ids),
            jnp.asarray(attn),
            jnp.asarray(speech_mask),
            jnp.asarray(text_ids),
            jnp.asarray(text_ids != 0),
            jnp.asarray([len(s) for s in speeches], jnp.float32),
            mask_rng=jax.random.PRNGKey(0),
            mask_override=jnp.asarray(full_mask),
            train=False,
        )
    )(variables)

    np.testing.assert_allclose(
        float(mine["ce_loss"]), out.ce_loss.item(), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(mine["length_loss"]), out.length_loss.item(), rtol=2e-3
    )
    np.testing.assert_allclose(float(mine["loss"]), out.loss.item(), rtol=2e-3)


# ---------------------------------------------------------------- s2a

Q, N = 4, 16


def test_s2a_training_loss_parity():
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

    rng = np.random.default_rng(6)
    b, t = 2, 12
    ac = rng.integers(0, N, (b, Q, t)).astype(np.int64)
    sem = rng.integers(0, V_SEM, (b, t)).astype(np.int64)
    mask = rng.random((b, t)) < 0.5

    ref.cosine_schedule_mask = lambda fl, bs: torch.from_numpy(mask)
    ref.encoder.train()  # teacher-injection branch; dropouts are all 0
    try:
        with torch.no_grad():
            out = ref(torch.from_numpy(ac), torch.from_numpy(sem))
    finally:
        ref.encoder.eval()

    mine = jax.jit(
        lambda v: model.apply(
            v,
            jnp.asarray(ac),
            jnp.asarray(sem),
            mask_rng=jax.random.PRNGKey(0),
            mask_override=jnp.asarray(mask),
            train=False,
        )
    )(variables)

    np.testing.assert_allclose(float(mine["loss"]), out.loss.item(), rtol=2e-3)
    np.testing.assert_array_equal(
        np.asarray(mine["target_acoustic_codes"]),
        out.target_acoustic_codes.numpy(),
    )
