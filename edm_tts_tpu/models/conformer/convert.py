"""Import reference (torch) Conformer weights into the flax parameter tree.

Maps one reference ``ConformerBlock``
(/root/reference/edm_tts/models/conformer/conformer.py:184-235) —
``Scale(0.5, PreNorm(ff1))`` / ``PreNorm(attn)`` / conv module / ff2 /
post-LN — onto our ``ConformerBlock`` (conformer.py here): the PreNorm
LayerNorms become the block's auto-numbered ``LayerNorm_{0,1,2}``, Linears
transpose to ``(in, out)`` kernels, the k=1 Conv1d pointwise layers become
Dense kernels, and the depthwise conv transposes to ``(k, 1, C)``.

Shared by the t2s and s2a converters (both stages wrap this backbone).
"""

from __future__ import annotations

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    # always copy: torch's .numpy() shares storage with the live tensor, and
    # on the CPU backend jnp.asarray is zero-copy too — without this, a torch
    # optimizer stepping the source model would silently mutate the
    # "converted" params.
    return np.array(x, dtype=np.float32)


def linear(sd: dict, prefix: str, bias: bool = True) -> dict:
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def layer_norm(sd: dict, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _pointwise(sd: dict, prefix: str) -> dict:
    """k=1 Conv1d (out,in,1) -> Dense kernel (in,out)."""
    return {
        "kernel": _np(sd[f"{prefix}.weight"])[:, :, 0].T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _feed_forward(sd: dict, prefix: str) -> dict:
    """FeedForward.net = [Linear, Swish, Dropout, Linear, Dropout]."""
    return {
        "Dense_0": linear(sd, f"{prefix}.net.0"),
        "Dense_1": linear(sd, f"{prefix}.net.3"),
    }


def conformer_block_params(sd: dict, prefix: str) -> dict:
    """One reference ConformerBlock state-dict subtree -> our block params."""
    conv = f"{prefix}.conv.net"
    return {
        # PreNorm LayerNorms: ff1 (Scale.fn=PreNorm), attn (PreNorm), ff2
        "LayerNorm_0": layer_norm(sd, f"{prefix}.ff1.fn.norm"),
        "LayerNorm_1": layer_norm(sd, f"{prefix}.attn.norm"),
        "LayerNorm_2": layer_norm(sd, f"{prefix}.ff2.fn.norm"),
        "ff1": _feed_forward(sd, f"{prefix}.ff1.fn.fn"),
        "ff2": _feed_forward(sd, f"{prefix}.ff2.fn.fn"),
        "attn": {
            "to_q": linear(sd, f"{prefix}.attn.fn.to_q", bias=False),
            "to_kv": linear(sd, f"{prefix}.attn.fn.to_kv", bias=False),
            "to_out": linear(sd, f"{prefix}.attn.fn.to_out"),
        },
        "conv": {
            "LayerNorm_0": layer_norm(sd, f"{conv}.0"),
            "pw_in": _pointwise(sd, f"{conv}.2"),
            # depthwise (C,1,k) -> (k,1,C)
            "dw_kernel": np.transpose(_np(sd[f"{conv}.4.conv.weight"]), (2, 1, 0)),
            "dw_bias": _np(sd[f"{conv}.4.conv.bias"]),
            "ChanLayerNorm_0": {"weight": _np(sd[f"{conv}.6.weight"]).reshape(-1)},
            "pw_out": _pointwise(sd, f"{conv}.7"),
        },
        "post_norm": layer_norm(sd, f"{prefix}.post_norm"),
    }


def conformer_params(sd: dict, prefix: str, depth: int) -> dict:
    """Reference ``Conformer.layers.{i}`` stack -> our ``block_{i}`` tree."""
    return {
        f"block_{i}": conformer_block_params(sd, f"{prefix}.layers.{i}")
        for i in range(depth)
    }
