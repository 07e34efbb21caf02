"""Convert HF (torch) HuBERT weights to the flax parameter tree.

Used once, offline, to import ``facebook/hubert-large-ll60k`` (the frozen
semantic feature extractor; reference semantic_tokenizer_hubert.py:23) from a
local HF checkpoint. The pos-conv weight-norm (g, v) pair is folded into the
effective kernel (the model is inference-only). Handles both old
(``weight_g``/``weight_v``) and new (``parametrizations.weight.original*``)
torch weight-norm naming.
"""

from __future__ import annotations

import numpy as np

from edm_tts_tpu.models.hubert.config import HubertConfig


def _t(w) -> np.ndarray:
    # always copy (torch .numpy() views share storage with the live tensor;
    # CPU-backend jnp.asarray is zero-copy as well)
    return np.array(w, dtype=np.float32)


def from_hf_state_dict(cfg: HubertConfig, sd: dict) -> dict:
    """``sd``: HF HubertModel state dict (tensors or ndarrays) -> flax params."""
    sd = {k: _t(v) for k, v in sd.items()}
    p: dict = {}

    fe: dict = {}
    for i in range(len(cfg.conv_dim)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]  # (out,in,k)
        fe[f"conv_{i}_kernel"] = np.transpose(w, (2, 1, 0))
        if cfg.conv_bias:
            fe[f"conv_{i}_bias"] = sd[f"feature_extractor.conv_layers.{i}.conv.bias"]
        if cfg.feat_extract_norm == "layer":
            fe[f"layer_norm_{i}"] = {
                "scale": sd[f"feature_extractor.conv_layers.{i}.layer_norm.weight"],
                "bias": sd[f"feature_extractor.conv_layers.{i}.layer_norm.bias"],
            }
        elif cfg.feat_extract_norm == "group" and i == 0:
            fe["group_norm"] = {
                "scale": sd["feature_extractor.conv_layers.0.layer_norm.weight"],
                "bias": sd["feature_extractor.conv_layers.0.layer_norm.bias"],
            }
    p["feature_extractor"] = fe

    p["feat_proj_layer_norm"] = {
        "scale": sd["feature_projection.layer_norm.weight"],
        "bias": sd["feature_projection.layer_norm.bias"],
    }
    p["feat_proj"] = {
        "kernel": sd["feature_projection.projection.weight"].T,
        "bias": sd["feature_projection.projection.bias"],
    }

    # pos conv: fold weight norm (dim=2 -> norm over (out, in) per tap)
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.weight_g" in sd:
        g, v = sd[f"{base}.weight_g"], sd[f"{base}.weight_v"]
    else:
        g = sd[f"{base}.parametrizations.weight.original0"]
        v = sd[f"{base}.parametrizations.weight.original1"]
    norm = np.sqrt(np.sum(v**2, axis=(0, 1), keepdims=True))
    w = v * (g / norm)  # (out, in/groups, k)
    p["pos_conv"] = {
        "kernel": np.transpose(w, (2, 1, 0)),
        "bias": sd[f"{base}.bias"],
    }

    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "layer_norm": {
                "scale": sd[f"{b}.layer_norm.weight"],
                "bias": sd[f"{b}.layer_norm.bias"],
            },
            "q_proj": {"kernel": sd[f"{b}.attention.q_proj.weight"].T,
                       "bias": sd[f"{b}.attention.q_proj.bias"]},
            "k_proj": {"kernel": sd[f"{b}.attention.k_proj.weight"].T,
                       "bias": sd[f"{b}.attention.k_proj.bias"]},
            "v_proj": {"kernel": sd[f"{b}.attention.v_proj.weight"].T,
                       "bias": sd[f"{b}.attention.v_proj.bias"]},
            "out_proj": {"kernel": sd[f"{b}.attention.out_proj.weight"].T,
                         "bias": sd[f"{b}.attention.out_proj.bias"]},
            "final_layer_norm": {
                "scale": sd[f"{b}.final_layer_norm.weight"],
                "bias": sd[f"{b}.final_layer_norm.bias"],
            },
            "fc1": {"kernel": sd[f"{b}.feed_forward.intermediate_dense.weight"].T,
                    "bias": sd[f"{b}.feed_forward.intermediate_dense.bias"]},
            "fc2": {"kernel": sd[f"{b}.feed_forward.output_dense.weight"].T,
                    "bias": sd[f"{b}.feed_forward.output_dense.bias"]},
        }

    p["encoder_layer_norm"] = {
        "scale": sd["encoder.layer_norm.weight"],
        "bias": sd["encoder.layer_norm.bias"],
    }
    return {"params": p}
