"""End-to-end converter CLI test: reference save_pretrained checkpoints ->
convert_{dac,t2s,s2a}.py -> hub.load_* -> outputs match the torch modules.

Proves the whole import chain (reference config.json parsing, state-dict
mapping, orbax export, template-based reload) on tiny random-init models —
given the published reference checkpoints these CLIs produce directly
servable model dirs.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_torch import install_reference_path

install_reference_path()

from edm_tts.models.dac.configuration import DACConfig  # noqa: E402
from edm_tts.models.dac.modeling_dac import DAC  # noqa: E402
from edm_tts.models.text_to_semantic.configuration import (  # noqa: E402
    TextToSemanticWLenConfig,
)
from edm_tts.models.text_to_semantic.modeling_text_to_semantic import (  # noqa: E402
    TextToSemanticWLen,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(script: str, *args: str) -> None:
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "utility_scripts", script), *args],
        check=True,
        cwd=REPO,
        env=env,
        timeout=300,
    )


@pytest.fixture(scope="module")
def dac_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    cfg = DACConfig(
        encoder_dim=8,
        encoder_rates=[2, 4, 5, 8],
        decoder_dim=96,
        decoder_rates=[8, 5, 4, 2],
        n_codebooks=3,
        codebook_size=16,
        codebook_dim=4,
        quantizer_dropout=0.0,
    )
    ref = DAC(cfg).eval()
    path = str(tmp_path_factory.mktemp("ref_dac"))
    ref.save_pretrained(path)
    return ref, path


def test_convert_dac_cli(dac_ckpt, tmp_path):
    ref, path = dac_ckpt
    out = str(tmp_path / "codec")
    _run_cli("convert_dac.py", "--torch_dir", path, "--output", out)

    from edm_tts_tpu.models.codec import Codec
    from edm_tts_tpu.utils.hub import load_codec

    codec, params = load_codec(out)
    rng = np.random.default_rng(0)
    audio = (0.5 * rng.standard_normal((1, 1600, 1))).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref.encode_to_codes(
            torch.from_numpy(np.transpose(audio, (0, 2, 1)))
        ).numpy()
    codes = np.asarray(
        jax.jit(lambda v, a: codec.apply(v, a, method=Codec.encode_to_codes))(
            params, jnp.asarray(audio)
        )
    )
    np.testing.assert_array_equal(codes, ref_codes)


def test_convert_t2s_cli(tmp_path):
    torch.manual_seed(1)
    ref_cfg = TextToSemanticWLenConfig(
        hidden_size=32,
        semantic_vocab_size=24,
        text_vocab_size=16,
        main_encoder_num_heads=4,
        main_encoder_num_layers=2,
        main_encoder_ff_mult=2,
        length_predictor_num_heads=4,
        length_predictor_num_layers=1,
        length_predictor_ff_mult=2,
        attn_flash=False,
    )
    ref = TextToSemanticWLen(ref_cfg).eval()
    src = str(tmp_path / "ref_t2s")
    ref.save_pretrained(src)
    # the saved json carries main_encoder_args incl. the derived dim_head
    with open(os.path.join(src, "config.json")) as f:
        assert "dim_head" in json.load(f)["main_encoder_args"]

    out = str(tmp_path / "t2s")
    _run_cli("convert_t2s.py", "--torch_dir", src, "--output", out)

    from edm_tts_tpu.models.t2s import TextToSemantic
    from edm_tts_tpu.utils.hub import load_t2s

    model, params = load_t2s(out)
    rng = np.random.default_rng(0)
    text_ids = rng.integers(5, 21, (1, 6)).astype(np.int64)
    with torch.no_grad():
        t_ids = torch.from_numpy(text_ids)
        emb = ref.input_embedding(t_ids)
        inp = torch.cat([ref.length_token, emb], dim=1)
        o, *_ = ref.length_predictor(inp, return_attn=False)
        ref_pred = ref.length_pred_head(o[:, 0]).squeeze(-1).numpy()
    mine = np.asarray(
        jax.jit(
            lambda v, i: model.apply(v, i, None, method=TextToSemantic.predict_log_length)
        )(params, jnp.asarray(text_ids))
    )
    np.testing.assert_allclose(mine, ref_pred, atol=5e-4, rtol=1e-3)


def test_convert_s2a_cli(dac_ckpt, tmp_path):
    from edm_tts.models.injection_conformer.configuration import (
        InjectionConformerConfig,
    )
    from edm_tts.models.injection_conformer.modeling_injection_conformer import (
        InjectionConformerModel,
    )

    _, dac_path = dac_ckpt
    torch.manual_seed(2)
    ref_cfg = InjectionConformerConfig(
        hidden_size=32,
        num_semantic_tokens=24,
        acoustic_model_path=dac_path,
        encoder_num_heads=4,
        encoder_num_layers=3,
        encoder_ff_mult=2,
        encoder_attn_dropout=0.0,
        encoder_ff_dropout=0.0,
        encoder_conv_dropout=0.0,
        injection_layers=(1,),
        attn_flash=False,
    )
    ref = InjectionConformerModel(ref_cfg).eval()
    src = str(tmp_path / "ref_s2a")
    ref.save_pretrained(src)

    out = str(tmp_path / "s2a")
    _run_cli(
        "convert_s2a.py",
        "--torch_dir",
        src,
        "--codec_dir",
        dac_path,
        "--output",
        out,
    )

    from edm_tts_tpu.utils.hub import load_s2a

    model, params = load_s2a(out)
    rng = np.random.default_rng(1)
    b, t = 1, 8
    sem = rng.integers(0, 24, (b, t)).astype(np.int64)
    ac = rng.integers(0, 16, (b, 3, t)).astype(np.int64)
    with torch.no_grad():
        semf = ref.semantic_embedding(torch.from_numpy(sem))
        ac_unred = ref.acoustic_model.codes_to_features_unreduced(torch.from_numpy(ac))
        ac0 = ref.acoustic_feat_proj(ac_unred[:, 0].transpose(1, 2))
        enc_in = semf + ac0
        ref_logits = ref.encoder.forward_first_level(enc_in).numpy()

    def f(mdl):
        semf = mdl.embed_semantic(jnp.asarray(sem))
        ac_unred = mdl.acoustic_features_unreduced(jnp.asarray(ac))
        ac0 = mdl.acoustic_feat_proj(ac_unred[:, 0])
        return mdl.forward_first_level(semf + ac0)

    mine = np.asarray(jax.jit(lambda v: model.apply(v, method=f))(params))
    np.testing.assert_allclose(mine, ref_logits[:, 0], atol=5e-4, rtol=1e-3)
