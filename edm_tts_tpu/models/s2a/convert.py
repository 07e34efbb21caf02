"""Import reference (torch) InjectionConformerModel checkpoints into flax.

Maps the reference state dict
(/root/reference/edm_tts/models/injection_conformer/modeling_injection_conformer.py:28-60
+ injection_conformer_wrapper.py:9-54) onto our tree: the embedded frozen DAC
(``acoustic_model.*`` -> ``codec``, via models/codec/convert.py), semantic
embedding, mask token, ``acoustic_feat_proj``/``project_injection``
Linear+LN pairs, the 16 Conformer blocks (models/conformer/convert.py), the
fine head, and the shared EinMix logits head (``q d l`` weight + ``q l``
bias -> our stacked ``logits_w``/``logits_b``).
"""

from __future__ import annotations

from edm_tts_tpu.models.codec.convert import from_torch_state_dict as codec_from_torch
from edm_tts_tpu.models.conformer.convert import (
    _np,
    conformer_params,
    layer_norm,
    linear,
)
from edm_tts_tpu.models.s2a.config import S2AConfig


def _feat_proj(sd: dict, prefix: str) -> dict:
    """nn.Sequential(Linear, LayerNorm) -> FeatProj {Dense_0, LayerNorm_0}."""
    return {
        "Dense_0": linear(sd, f"{prefix}.0"),
        "LayerNorm_0": layer_norm(sd, f"{prefix}.1"),
    }


def from_torch_state_dict(cfg: S2AConfig, sd: dict) -> dict:
    dac_sd = {
        k[len("acoustic_model.") :]: v
        for k, v in sd.items()
        if k.startswith("acoustic_model.")
    }
    p: dict = {
        "codec": codec_from_torch(cfg.codec, dac_sd)["params"],
        "semantic_embedding": {"embedding": _np(sd["semantic_embedding.weight"])},
        "mask_token": _np(sd["mask_token"]),
        "acoustic_feat_proj": _feat_proj(sd, "acoustic_feat_proj"),
        "fine_head": linear(sd, "encoder.fine_head.0"),
        "logits_norm": layer_norm(sd, "encoder.to_logits.0"),
        "logits_w": _np(sd["encoder.to_logits.1.weight"]),  # (Q, H, N)
        "logits_b": _np(sd["encoder.to_logits.1.bias"]).reshape(
            cfg.num_quantizers, cfg.num_codevectors
        ),
    }
    p.update(conformer_params(sd, "encoder", cfg.encoder_num_layers))
    for i in range(len(cfg.injection_layers)):
        p[f"project_injection_{i}"] = _feat_proj(sd, f"encoder.project_injection.{i}")
    return {"params": p}


def to_torch_state_dict(cfg: S2AConfig, variables: dict) -> dict:
    """Flax s2a variables -> reference ``InjectionConformerModel`` state
    dict, including the embedded frozen DAC under ``acoustic_model.*``
    (modeling_injection_conformer.py:31). Exact inverse of
    ``from_torch_state_dict``."""
    import numpy as np

    from edm_tts_tpu.models.codec.convert import to_torch_state_dict as codec_to_torch
    from edm_tts_tpu.models.conformer.convert import (
        conformer_to_torch,
        layer_norm_to_torch,
        linear_to_torch,
    )

    def _f32(x):
        return np.array(np.asarray(x), dtype=np.float32)

    p = variables["params"]
    out: dict = {}
    for k, v in codec_to_torch(cfg.codec, {"params": p["codec"]}).items():
        out[f"acoustic_model.{k}"] = v
    out["semantic_embedding.weight"] = _f32(p["semantic_embedding"]["embedding"])
    out["mask_token"] = _f32(p["mask_token"])
    linear_to_torch(out, p["acoustic_feat_proj"]["Dense_0"], "acoustic_feat_proj.0")
    layer_norm_to_torch(out, p["acoustic_feat_proj"]["LayerNorm_0"], "acoustic_feat_proj.1")
    linear_to_torch(out, p["fine_head"], "encoder.fine_head.0")
    layer_norm_to_torch(out, p["logits_norm"], "encoder.to_logits.0")
    out["encoder.to_logits.1.weight"] = _f32(p["logits_w"])  # (Q, H, N)
    # EinMix bias: our (Q, N) -> torch (1, 1, Q, N)
    out["encoder.to_logits.1.bias"] = _f32(p["logits_b"]).reshape(
        1, 1, cfg.num_quantizers, cfg.num_codevectors
    )
    conformer_to_torch(out, p, "encoder", cfg.encoder_num_layers)
    for i in range(len(cfg.injection_layers)):
        fp = p[f"project_injection_{i}"]
        linear_to_torch(out, fp["Dense_0"], f"encoder.project_injection.{i}.0")
        layer_norm_to_torch(out, fp["LayerNorm_0"], f"encoder.project_injection.{i}.1")
    # contiguify transpose views for raw-buffer serializers (safetensors)
    return {k: np.ascontiguousarray(v) for k, v in out.items()}
