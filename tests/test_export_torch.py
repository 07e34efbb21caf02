"""Reverse-direction weight export: flax -> reference torch state dicts.

For each stage the proof is a bit-exact round trip: instantiate the
reference torch model (random init), import its weights with the (already
forward-parity-proven) torch->flax converter, export them back with
``to_torch_state_dict``, and assert every tensor — including synthesized
buffers — is IDENTICAL to the original state dict. Then strict-load the
exported dict into a fresh torch model and spot-check a forward pass, which
proves the exported dict is actually loadable by the reference classes
(``load_state_dict(strict=True)``) — the surface a user needs to publish a
framework-trained checkpoint back into the reference ecosystem.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edm_tts_tpu.models.codec import CodecConfig
from edm_tts_tpu.models.codec.convert import from_torch_state_dict as dac_import
from edm_tts_tpu.models.codec.convert import to_torch_state_dict as dac_export
from edm_tts_tpu.models.s2a import S2AConfig
from edm_tts_tpu.models.s2a.convert import from_torch_state_dict as s2a_import
from edm_tts_tpu.models.s2a.convert import to_torch_state_dict as s2a_export
from edm_tts_tpu.models.t2s import T2SConfig
from edm_tts_tpu.models.t2s.convert import from_torch_state_dict as t2s_import
from edm_tts_tpu.models.t2s.convert import to_torch_state_dict as t2s_export
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

TINY_DAC = dict(
    encoder_dim=8,
    encoder_rates=[2, 4, 5, 8],
    decoder_dim=96,
    decoder_rates=[8, 5, 4, 2],
    n_codebooks=3,
    codebook_size=16,
    codebook_dim=4,
    quantizer_dropout=0.0,
)


def _assert_state_dicts_equal(exported: dict, original: dict):
    assert set(exported) == set(original.keys()), (
        sorted(set(original.keys()) - set(exported))[:5],
        sorted(set(exported) - set(original.keys()))[:5],
    )
    for k, v in original.items():
        np.testing.assert_array_equal(
            exported[k], v.detach().cpu().numpy(), err_msg=k
        )


def test_codec_export_round_trip_and_strict_load():
    torch.manual_seed(0)
    ref = DAC(DACConfig(**TINY_DAC)).eval()
    cfg = CodecConfig(
        encoder_dim=TINY_DAC["encoder_dim"],
        encoder_rates=tuple(TINY_DAC["encoder_rates"]),
        decoder_dim=TINY_DAC["decoder_dim"],
        decoder_rates=tuple(TINY_DAC["decoder_rates"]),
        n_codebooks=TINY_DAC["n_codebooks"],
        codebook_size=TINY_DAC["codebook_size"],
        codebook_dim=TINY_DAC["codebook_dim"],
        quantizer_dropout=0.0,
    )
    variables = dac_import(cfg, ref.state_dict())
    exported = dac_export(cfg, variables)
    _assert_state_dicts_equal(exported, ref.state_dict())

    torch.manual_seed(99)
    fresh = DAC(DACConfig(**TINY_DAC)).eval()
    fresh.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in exported.items()},
        strict=True,
    )
    audio = torch.from_numpy(
        (0.3 * np.random.default_rng(0).standard_normal((1, 1, 3200))).astype(
            np.float32
        )
    )
    with torch.no_grad():
        codes_ref = ref.encode_to_codes(audio)
        codes_new = fresh.encode_to_codes(audio)
    np.testing.assert_array_equal(codes_new.numpy(), codes_ref.numpy())


def test_codec_export_legacy_weight_norm_names():
    torch.manual_seed(0)
    ref = DAC(DACConfig(**TINY_DAC))
    cfg = CodecConfig(
        encoder_dim=8, decoder_dim=96, n_codebooks=3, codebook_size=16,
        codebook_dim=4, quantizer_dropout=0.0,
    )
    variables = dac_import(cfg, ref.state_dict())
    legacy = dac_export(cfg, variables, legacy_wn=True)
    assert "encoder.block.0.weight_g" in legacy
    assert not any("parametrizations" in k for k in legacy)
    # and the import round-trips from the legacy naming too
    again = dac_import(cfg, legacy)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), variables, again
    )


def test_discriminator_export_round_trip_and_strict_load():
    from edm_tts.models.dac.discriminators import (
        DACDiscriminator,
        DACDiscriminatorConfig,
    )
    from edm_tts_tpu.models.codec.convert import (
        discriminator_from_torch_state_dict,
        discriminator_to_torch_state_dict,
    )
    from edm_tts_tpu.models.codec.discriminator import DiscriminatorConfig

    torch.manual_seed(7)
    # all three families: MPD (periods), MSD (rates), MRD (ffts)
    ref = DACDiscriminator(
        DACDiscriminatorConfig(
            periods=[2, 3], rates=[1], fft_sizes=[512], sample_rate=16000
        )
    ).eval()
    cfg = DiscriminatorConfig(
        sample_rate=16000, periods=(2, 3), rates=(1,), fft_sizes=(512,)
    )
    variables = discriminator_from_torch_state_dict(cfg, ref.state_dict())
    exported = discriminator_to_torch_state_dict(cfg, variables)
    _assert_state_dicts_equal(exported, ref.state_dict())

    torch.manual_seed(123)
    fresh = DACDiscriminator(
        DACDiscriminatorConfig(
            periods=[2, 3], rates=[1], fft_sizes=[512], sample_rate=16000
        )
    ).eval()
    fresh.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in exported.items()},
        strict=True,
    )
    x = torch.from_numpy(
        (0.3 * np.random.default_rng(1).standard_normal((1, 1, 4000))).astype(
            np.float32
        )
    )
    with torch.no_grad():
        a = ref(x)
        b = fresh(x)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fb[-1].numpy(), fa[-1].numpy())


def test_t2s_export_round_trip_and_strict_load():
    torch.manual_seed(4)
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
    variables = t2s_import(cfg, ref.state_dict())
    exported = t2s_export(cfg, variables)
    _assert_state_dicts_equal(exported, ref.state_dict())

    torch.manual_seed(77)
    fresh = TextToSemanticWLen(
        TextToSemanticWLenConfig(attn_flash=False, **kw)
    ).eval()
    fresh.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in exported.items()},
        strict=True,
    )
    ids = torch.tensor([[1, 6, 8, 3, 2, 30, 40, 33, 3, 0, 0, 0]])
    attn = ids != 0
    with torch.no_grad():
        a = ref.extract_features(ids, attn)
        b = fresh.extract_features(ids, attn)
    for x, y in zip(a, b):
        if x is None:
            assert y is None
            continue
        np.testing.assert_array_equal(y.numpy(), x.numpy())


def test_s2a_export_round_trip_and_strict_load():
    torch.manual_seed(0)
    dac_cfg = DACConfig(**TINY_DAC)
    tmp = tempfile.mkdtemp()
    DAC(dac_cfg).save_pretrained(tmp)
    ic_kw = dict(
        hidden_size=32,
        num_semantic_tokens=24,
        acoustic_model_path=tmp,
        encoder_num_heads=4,
        encoder_num_layers=4,
        encoder_ff_mult=2,
        injection_layers=(1, 2),
        attn_flash=False,
    )
    ref = InjectionConformerModel(InjectionConformerConfig(**ic_kw)).eval()
    cfg = S2AConfig(
        hidden_size=32,
        num_semantic_tokens=24,
        encoder_num_heads=4,
        encoder_num_layers=4,
        encoder_ff_mult=2,
        injection_layers=(1, 2),
        codec=CodecConfig(
            encoder_dim=8, decoder_dim=96, n_codebooks=3, codebook_size=16,
            codebook_dim=4, quantizer_dropout=0.0,
        ),
    )
    variables = s2a_import(cfg, ref.state_dict())
    exported = s2a_export(cfg, variables)
    _assert_state_dicts_equal(exported, ref.state_dict())

    torch.manual_seed(55)
    fresh = InjectionConformerModel(InjectionConformerConfig(**ic_kw)).eval()
    fresh.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in exported.items()},
        strict=True,
    )
    rng = np.random.default_rng(3)
    ac = torch.from_numpy(rng.integers(0, 16, (1, 3, 10)))
    sem = torch.from_numpy(rng.integers(0, 24, (1, 10)))
    mask = torch.from_numpy(np.ones((1, 10), bool))
    ref.cosine_schedule_mask = lambda fl, bs: mask
    fresh.cosine_schedule_mask = lambda fl, bs: mask
    with torch.no_grad():
        a = ref(ac, sem)
        b = fresh(ac, sem)
    np.testing.assert_array_equal(b.loss.numpy(), a.loss.numpy())
