"""Model save/load: the ``from_pretrained``/``save_pretrained`` equivalent.

Every exported model dir holds ``config.json`` + an orbax ``params/``
checkpoint (see parallel/checkpoint.py ``export_model``). These helpers
reconstruct (module, params) pairs for the three stages + HuBERT, mirroring
the reference's HF ``PreTrainedModel.from_pretrained`` surfaces
(inference.py:26-31).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.hubert import HubertConfig, HubertModel
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
from edm_tts_tpu.models.tokenizer import AudioTokenizer, SemanticTokenizerHubert
from edm_tts_tpu.parallel.checkpoint import export_model, load_model_params


def _read_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def save_codec(path: str, codec: Codec, params) -> None:
    export_model(path, params, codec.config.to_json())


def load_codec(path: str, dtype=jnp.float32) -> tuple[Codec, dict]:
    cfg = CodecConfig.from_dict(_read_config(path))
    codec = Codec(cfg, dtype=dtype)
    template = jax.eval_shape(
        lambda: codec.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop_length, 1)))
    )
    params = load_model_params(path, template)
    return codec, params


def save_s2a(path: str, model: InjectionConformer, params) -> None:
    export_model(path, params, model.cfg.to_json())


def load_s2a(
    path: str, dtype=jnp.float32, quantize: str = "none"
) -> tuple[InjectionConformer, dict]:
    cfg = S2AConfig.from_dict(_read_config(path))
    model = InjectionConformer(cfg, dtype=dtype)
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.num_quantizers, 8), jnp.int32),
            jnp.zeros((1, 8), jnp.int32),
            mask_rng=jax.random.PRNGKey(0),
            train=False,
        )
    )
    # the s2a training forward only touches the codec's quantizer; the saved
    # checkpoint embeds the FULL frozen codec (encoder/decoder too, needed by
    # decode_audio) — widen the template accordingly
    codec = Codec(cfg.codec, dtype=dtype)
    codec_template = jax.eval_shape(
        lambda: codec.init(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.codec.hop_length, 1))
        )
    )
    template["params"]["codec"] = codec_template["params"]
    params = load_model_params(path, template)
    if quantize != "none":
        from edm_tts_tpu.models.quantize import quantize_s2a

        model, params = quantize_s2a(model, params, mode=quantize)
    return model, params


def save_t2s(path: str, model: TextToSemantic, params) -> None:
    export_model(path, params, model.cfg.to_json())


def load_t2s(
    path: str, dtype=jnp.float32, quantize: str = "none"
) -> tuple[TextToSemantic, dict]:
    cfg = T2SConfig.from_dict(_read_config(path))
    model = TextToSemantic(cfg, dtype=dtype)
    b, l, lt = 1, 16, 4
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((b, l), jnp.int32),
            jnp.ones((b, l), bool),
            jnp.zeros((b, l), bool),
            jnp.zeros((b, lt), jnp.int32),
            jnp.ones((b, lt), bool),
            jnp.ones((b,)),
            mask_rng=jax.random.PRNGKey(0),
            train=False,
        )
    )
    params = load_model_params(path, template)
    if quantize != "none":
        from edm_tts_tpu.models.quantize import quantize_t2s

        model, params = quantize_t2s(model, params, mode=quantize)
    return model, params


def save_hubert(path: str, cfg: HubertConfig, params, cluster_centers=None) -> None:
    import dataclasses

    blob = {"hubert": params}
    if cluster_centers is not None:
        blob["cluster_centers"] = jnp.asarray(cluster_centers, jnp.float32)
    export_model(path, blob, json.dumps(dataclasses.asdict(cfg), indent=2))


def load_semantic_tokenizer(
    path: str, output_layer: int = 18, dtype=jnp.float32
) -> tuple[SemanticTokenizerHubert, dict]:
    cfg_d = _read_config(path)
    cfg_d = {k: tuple(v) if isinstance(v, list) else v for k, v in cfg_d.items()}
    cfg_d.pop("model_type", None)
    cfg = HubertConfig(**cfg_d)
    tok = SemanticTokenizerHubert(cfg, output_layer=output_layer, dtype=dtype)
    params = load_model_params(path)
    return tok, params


def build_audio_tokenizer(
    codec_path: str, hubert_path: str, dtype=jnp.float32
):
    """Assemble the joint tokenizer + its params from exported model dirs."""
    codec, codec_params = load_codec(codec_path, dtype=dtype)
    sem, sem_params = load_semantic_tokenizer(hubert_path, dtype=dtype)
    tokenizer = AudioTokenizer(codec, sem)
    return tokenizer, codec_params, sem_params
