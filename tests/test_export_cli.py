"""End-to-end export surface: framework model dir -> reference-loadable
torch checkpoint dir via utility_scripts/export_torch.py, verified by
actually calling the reference classes' ``from_pretrained`` on the result
(the reference's entire deployment surface, inference.py:27-31) and
asserting bit-parity against the source flax model."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.utils.hub import save_codec
from reference_torch import install_reference_path

install_reference_path()

from edm_tts.models.dac.modeling_dac import DAC  # noqa: E402

sys.path.insert(0, "utility_scripts")

TINY = CodecConfig(
    encoder_dim=8,
    decoder_dim=96,
    n_codebooks=3,
    codebook_size=16,
    codebook_dim=4,
    quantizer_dropout=0.0,
)


def test_export_codec_cli_loads_via_reference_from_pretrained(tmp_path):
    from export_torch import export_codec

    codec = Codec(TINY)
    params = jax.jit(codec.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, TINY.hop_length, 1))
    )
    model_dir = str(tmp_path / "flax_codec")
    out_dir = str(tmp_path / "torch_codec")
    save_codec(model_dir, codec, params)
    export_codec(model_dir, out_dir, legacy_wn=False)

    ref = DAC.from_pretrained(out_dir).eval()
    audio = (0.3 * np.random.default_rng(0).standard_normal((1, 3200, 1))).astype(
        np.float32
    )
    with torch.no_grad():
        ref_codes = ref.encode_to_codes(
            torch.from_numpy(np.transpose(audio, (0, 2, 1)))
        ).numpy()
    my_codes = np.asarray(
        jax.jit(lambda p, a: codec.apply(p, a, method=codec.encode_to_codes))(
            params, jnp.asarray(audio)
        )
    )
    np.testing.assert_array_equal(my_codes, ref_codes)


def test_export_t2s_and_s2a_cli_load_via_reference_from_pretrained(tmp_path):
    from export_torch import export_s2a, export_t2s

    from edm_tts.models.injection_conformer.modeling_injection_conformer import (
        InjectionConformerModel,
    )
    from edm_tts.models.text_to_semantic.modeling_text_to_semantic import (
        TextToSemanticWLen,
    )
    from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
    from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
    from edm_tts_tpu.utils.hub import save_s2a, save_t2s

    rng = jax.random.PRNGKey(0)
    t2s_cfg = T2SConfig(
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
    t2s = TextToSemantic(t2s_cfg)
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r,
            jnp.zeros((1, 8), jnp.int32),
            jnp.ones((1, 8), bool),
            jnp.zeros((1, 8), bool),
            jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool),
            jnp.ones((1,)),
            mask_rng=r,
            train=False,
        )
    )(rng)
    save_t2s(str(tmp_path / "t2s"), t2s, t2s_params)
    export_t2s(str(tmp_path / "t2s"), str(tmp_path / "t2s_torch"))
    ref_t2s = TextToSemanticWLen.from_pretrained(str(tmp_path / "t2s_torch"))
    assert ref_t2s.config.hidden_size == 32
    np.testing.assert_array_equal(
        ref_t2s.state_dict()["pred_head.weight"].numpy(),
        np.asarray(t2s_params["params"]["pred_head"]["kernel"]).T,
    )

    s2a_cfg = S2AConfig(
        hidden_size=32,
        num_semantic_tokens=24,
        encoder_num_heads=4,
        encoder_num_layers=4,
        encoder_ff_mult=2,
        injection_layers=(1, 2),
        codec=TINY,
    )
    s2a = InjectionConformer(s2a_cfg)
    s2a_params = jax.jit(
        lambda r: s2a.init(
            r,
            jnp.zeros((1, 3, 8), jnp.int32),
            jnp.zeros((1, 8), jnp.int32),
            mask_rng=r,
            train=False,
        )
    )(rng)
    # the training forward only traces the codec's quantizer — splice in a
    # fully initialized codec, as the entry scripts do
    full_codec = Codec(TINY)
    codec_params = jax.jit(full_codec.init)(
        rng, jnp.zeros((1, TINY.hop_length, 1))
    )
    s2a_params = {
        "params": {**s2a_params["params"], "codec": codec_params["params"]}
    }
    save_s2a(str(tmp_path / "s2a"), s2a, s2a_params)
    export_s2a(str(tmp_path / "s2a"), str(tmp_path / "s2a_torch"), legacy_wn=False)
    # the reference loads the embedded frozen codec from acoustic_model_path
    # at construction (modeling_injection_conformer.py:31) — exported
    # alongside, so from_pretrained is self-contained
    ref_s2a = InjectionConformerModel.from_pretrained(str(tmp_path / "s2a_torch"))
    np.testing.assert_array_equal(
        ref_s2a.state_dict()["semantic_embedding.weight"].numpy(),
        np.asarray(s2a_params["params"]["semantic_embedding"]["embedding"]),
    )
    np.testing.assert_array_equal(
        ref_s2a.state_dict()[
            "acoustic_model.quantizer.quantizers.0.codebook.weight"
        ].numpy(),
        np.asarray(s2a_params["params"]["codec"]["quantizer"]["codebook"][0]),
    )
