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
