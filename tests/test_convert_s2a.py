"""Differential parity: flax InjectionConformer vs the reference torch model.

Instantiates the reference ``InjectionConformerModel``
(modeling_injection_conformer.py:25-128, wrapper.py:9-150) with a tiny
random-init config on CPU (embedded tiny DAC saved via save_pretrained),
imports weights via ``models/s2a/convert.from_torch_state_dict``, and asserts
- teacher-forced training logits (injections = cumulative GT features),
- dynamic-injection eval forward (argmax -> codes_to_features -> re-inject),
- ``forward_first_level``,
- the prompt-substitution full forward used by ``infer_special``
all match.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edm_tts_tpu.models.codec import CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.s2a.convert import from_torch_state_dict
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

H, Q, N, V_SEM = 32, 4, 16, 24
INJ = (1, 2)
DEPTH = 4


@pytest.fixture(scope="module")
def pair():
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
    dac = DAC(dac_cfg)
    tmp = tempfile.mkdtemp()
    dac.save_pretrained(tmp)
    ref_cfg = InjectionConformerConfig(
        hidden_size=H,
        num_semantic_tokens=V_SEM,
        acoustic_model_path=tmp,
        encoder_num_heads=4,
        encoder_num_layers=DEPTH,
        encoder_ff_mult=2,
        encoder_attn_dropout=0.0,
        encoder_ff_dropout=0.0,
        encoder_conv_dropout=0.0,
        injection_layers=INJ,
        attn_flash=False,
    )
    ref = InjectionConformerModel(ref_cfg).eval()

    cfg = S2AConfig(
        hidden_size=H,
        num_semantic_tokens=V_SEM,
        encoder_num_heads=4,
        encoder_num_layers=DEPTH,
        encoder_ff_mult=2,
        encoder_attn_dropout=0.0,
        encoder_ff_dropout=0.0,
        encoder_conv_dropout=0.0,
        injection_layers=INJ,
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
    variables = jax.tree.map(jnp.asarray, from_torch_state_dict(cfg, ref.state_dict()))
    return ref, model, variables, cfg


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(0)
    b, t = 2, 12
    ac = rng.integers(0, N, (b, Q, t)).astype(np.int64)
    sem = rng.integers(0, V_SEM, (b, t)).astype(np.int64)
    mask = rng.random((b, t)) < 0.5
    return ac, sem, mask


def _ref_encoder_input(ref, ac, sem, mask):
    """Deterministic re-build of the reference training forward's inputs
    (modeling_injection_conformer.py:86-105) with an explicit mask."""
    sem_t = torch.from_numpy(sem)
    ac_t = torch.from_numpy(ac)
    semantic_features = ref.semantic_embedding(sem_t)
    ac_unred = ref.acoustic_model.codes_to_features_unreduced(ac_t)  # (B,Q,D,T)
    acoustic_features = ref.acoustic_feat_proj(ac_unred[:, 0].transpose(1, 2))
    m = torch.from_numpy(mask)
    b, t, _ = semantic_features.shape
    enc_in = torch.where(
        m[:, :, None],
        semantic_features + ref.mask_token.expand(b, t, -1),
        semantic_features + acoustic_features,
    )
    injections = [
        ac_unred[:, : i + 1].sum(1).transpose(1, 2) for i in range(len(INJ))
    ]
    return enc_in, injections


def _my_forward_logits(model, variables, ac, sem, mask, teacher):
    def f(mdl):
        semf = mdl.embed_semantic(jnp.asarray(sem))
        ac_unred = mdl.acoustic_features_unreduced(jnp.asarray(ac))
        ac0 = mdl.acoustic_feat_proj(ac_unred[:, 0])
        enc_in = jnp.where(
            jnp.asarray(mask)[:, :, None],
            semf + mdl.mask_token_value(),
            semf + ac0,
        )
        kw = {}
        if teacher:
            cum = jnp.cumsum(ac_unred, axis=1)
            kw["teacher_injections"] = jnp.stack(
                [cum[:, i] for i in range(len(INJ))], axis=0
            )
        return mdl.forward_logits(enc_in, train=teacher, **kw)

    return np.asarray(jax.jit(lambda v: model.apply(v, method=f))(variables))


def test_teacher_forced_training_logits(pair, tokens):
    ref, model, variables, _ = pair
    ac, sem, mask = tokens
    enc_in, injections = _ref_encoder_input(ref, ac, sem, mask)
    ref.encoder.train()  # teacher branch (wrapper.py:113-117); dropouts are 0
    try:
        with torch.no_grad():
            ref_logits = ref.encoder(
                x=enc_in, injections=injections, acoustic_model=ref.acoustic_model
            ).numpy()
    finally:
        ref.encoder.eval()
    mine = _my_forward_logits(model, variables, ac, sem, mask, teacher=True)
    np.testing.assert_allclose(mine, ref_logits, atol=5e-4, rtol=1e-3)


def test_dynamic_injection_eval_logits(pair, tokens):
    """Inference-mode forward: argmax codes-so-far -> codec features ->
    re-inject (wrapper.py:119-129, no prompts)."""
    ref, model, variables, _ = pair
    ac, sem, mask = tokens
    enc_in, _ = _ref_encoder_input(ref, ac, sem, mask)
    with torch.no_grad():
        ref_logits = ref.encoder(
            x=enc_in, injections=None, acoustic_model=ref.acoustic_model
        ).numpy()
    mine = _my_forward_logits(model, variables, ac, sem, mask, teacher=False)
    np.testing.assert_allclose(mine, ref_logits, atol=5e-4, rtol=1e-3)


def test_forward_first_level(pair, tokens):
    ref, model, variables, _ = pair
    ac, sem, mask = tokens
    enc_in, _ = _ref_encoder_input(ref, ac, sem, mask)
    with torch.no_grad():
        ref_logits = ref.encoder.forward_first_level(enc_in).numpy()  # (B,1,T,N)

    def f(mdl):
        semf = mdl.embed_semantic(jnp.asarray(sem))
        ac_unred = mdl.acoustic_features_unreduced(jnp.asarray(ac))
        ac0 = mdl.acoustic_feat_proj(ac_unred[:, 0])
        enc_in = jnp.where(
            jnp.asarray(mask)[:, :, None], semf + mdl.mask_token_value(), semf + ac0
        )
        return mdl.forward_first_level(enc_in)

    mine = np.asarray(jax.jit(lambda v: model.apply(v, method=f))(variables))
    np.testing.assert_allclose(mine, ref_logits[:, 0], atol=5e-4, rtol=1e-3)


def test_prompt_substitution_forward(pair, tokens):
    """The infer_special final pass: prompt injections substituted at
    unmasked positions, logits for generated span only (modeling:146-168,
    221-229)."""
    ref, model, variables, _ = pair
    rng = np.random.default_rng(3)
    b, tp, tg = 2, 6, 8
    ac_prompt = rng.integers(0, N, (b, Q, tp)).astype(np.int64)
    sem_prompt = rng.integers(0, V_SEM, (b, tp)).astype(np.int64)
    sem_gen = rng.integers(0, V_SEM, (b, tg)).astype(np.int64)

    with torch.no_grad():
        sem_t, semp_t, acp_t = map(
            torch.from_numpy, (sem_gen, sem_prompt, ac_prompt)
        )
        semantic_features = ref.semantic_embedding(sem_t)
        enc_in = semantic_features + ref.mask_token.expand(b, tg, -1)
        semp_f = ref.semantic_embedding(semp_t)
        acp_unred = ref.acoustic_model.codes_to_features_unreduced(acp_t)
        acp0 = ref.acoustic_feat_proj(acp_unred[:, 0].transpose(1, 2))
        injections = [
            acp_unred[:, : i + 1].sum(1).transpose(1, 2) for i in range(len(INJ))
        ]
        zeros = torch.zeros(b, tg, injections[0].shape[-1])
        prompt_injections = [torch.cat([inj, zeros], dim=1) for inj in injections]
        enc_in = torch.cat([semp_f + acp0, enc_in], dim=1)
        mask_time = torch.zeros(b, tp + tg, dtype=torch.bool)
        mask_time[:, tp:] = True
        ref_logits = ref.encoder(
            x=enc_in,
            injections=prompt_injections,
            acoustic_model=ref.acoustic_model,
            mask_time_indices=mask_time,
        ).numpy()  # (B, Q, Tg, N)

    def f(mdl):
        semf = mdl.embed_semantic(jnp.asarray(sem_gen))
        enc = semf + mdl.mask_token_value()
        semp = mdl.embed_semantic(jnp.asarray(sem_prompt))
        acp_unred = mdl.acoustic_features_unreduced(jnp.asarray(ac_prompt))
        acp0 = mdl.acoustic_feat_proj(acp_unred[:, 0])
        cum = jnp.cumsum(acp_unred, axis=1)
        zeros = jnp.zeros((b, tg, cum.shape[-1]))
        prompt_inj = jnp.stack(
            [
                jnp.concatenate([cum[:, i], zeros], axis=1)
                for i in range(len(INJ))
            ],
            axis=0,
        )
        x = jnp.concatenate([semp + acp0, enc], axis=1)
        mask_time = jnp.concatenate(
            [jnp.zeros((b, tp), bool), jnp.ones((b, tg), bool)], axis=1
        )
        return mdl.forward_logits(
            x,
            prompt_injections=prompt_inj,
            mask_time=mask_time,
            generated_start=tp,
        )

    mine = np.asarray(jax.jit(lambda v: model.apply(v, method=f))(variables))
    np.testing.assert_allclose(mine, ref_logits, atol=5e-4, rtol=1e-3)
