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
