"""Import reference (torch) TextToSemanticWLen checkpoints into flax.

Maps the reference state dict
(/root/reference/edm_tts/models/text_to_semantic/modeling_text_to_semantic.py:30-62)
onto our tree: joint-vocab embedding, main + length-predictor Conformers
(via models/conformer/convert.py), ``pred_transform`` (Linear+GELU+LN) split
into ``pred_dense``/``pred_norm``, and the two heads. Token-id buffers
(text_token etc.) are constants, not weights, and are skipped.
"""

from __future__ import annotations

from edm_tts_tpu.models.conformer.convert import (
    _np,
    conformer_params,
    layer_norm,
    linear,
)
from edm_tts_tpu.models.t2s.config import T2SConfig


def from_torch_state_dict(cfg: T2SConfig, sd: dict) -> dict:
    p = {
        "input_embedding": {"embedding": _np(sd["input_embedding.weight"])},
        "length_token": _np(sd["length_token"]),
        "conformer": conformer_params(sd, "conformer", cfg.main_encoder_num_layers),
        "length_predictor": conformer_params(
            sd, "length_predictor", cfg.length_predictor_num_layers
        ),
        "pred_dense": linear(sd, "pred_transform.0"),
        "pred_norm": layer_norm(sd, "pred_transform.2"),
        "pred_head": linear(sd, "pred_head"),
        "length_pred_head": linear(sd, "length_pred_head"),
    }
    return {"params": p}


def to_torch_state_dict(cfg: T2SConfig, variables: dict) -> dict:
    """Flax t2s variables -> reference ``TextToSemanticWLen`` state dict.

    Exact inverse of ``from_torch_state_dict``; also synthesizes the
    reference's registered token-id buffers (text/speech/sep/pad/mask and the
    ``false`` scratch buffer, modeling_text_to_semantic.py:41-48) so a
    strict ``load_state_dict`` succeeds.
    """
    import numpy as np

    from edm_tts_tpu.models.conformer.convert import (
        conformer_to_torch,
        layer_norm_to_torch,
        linear_to_torch,
    )
    from edm_tts_tpu.models.t2s.model import SPECIAL_TOKENS

    p = variables["params"]
    out: dict = {
        "input_embedding.weight": np.array(
            np.asarray(p["input_embedding"]["embedding"]), dtype=np.float32
        ),
        "length_token": np.array(np.asarray(p["length_token"]), dtype=np.float32),
        "text_token": np.array([SPECIAL_TOKENS["text"]], dtype=np.int64),
        "speech_token": np.array([SPECIAL_TOKENS["speech"]], dtype=np.int64),
        "sep_token": np.array([SPECIAL_TOKENS["sep"]], dtype=np.int64),
        "pad_token": np.array([SPECIAL_TOKENS["pad"]], dtype=np.int64),
        "mask_token": np.array([SPECIAL_TOKENS["mask"]], dtype=np.int64),
        "false": np.array([False]),
    }
    conformer_to_torch(out, p["conformer"], "conformer", cfg.main_encoder_num_layers)
    conformer_to_torch(
        out, p["length_predictor"], "length_predictor", cfg.length_predictor_num_layers
    )
    linear_to_torch(out, p["pred_dense"], "pred_transform.0")
    layer_norm_to_torch(out, p["pred_norm"], "pred_transform.2")
    linear_to_torch(out, p["pred_head"], "pred_head")
    linear_to_torch(out, p["length_pred_head"], "length_pred_head")
    # contiguify transpose views for raw-buffer serializers (safetensors)
    return {k: np.ascontiguousarray(v) for k, v in out.items()}
