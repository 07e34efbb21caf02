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


# ---------------------------------------------------------------------------
# Reverse direction: flax -> reference torch state dict (export). Each
# function is the exact inverse of its import counterpart above, so a
# round-trip (torch -> flax -> torch) is bit-identical in f32.


def _f32(x) -> np.ndarray:
    return np.array(np.asarray(x), dtype=np.float32)


def linear_to_torch(out: dict, p: dict, prefix: str, bias: bool = True) -> None:
    out[f"{prefix}.weight"] = _f32(p["kernel"]).T
    if bias:
        out[f"{prefix}.bias"] = _f32(p["bias"])


def layer_norm_to_torch(out: dict, p: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = _f32(p["scale"])
    out[f"{prefix}.bias"] = _f32(p["bias"])


def _pointwise_to_torch(out: dict, p: dict, prefix: str) -> None:
    """Dense kernel (in,out) -> k=1 Conv1d weight (out,in,1)."""
    out[f"{prefix}.weight"] = _f32(p["kernel"]).T[:, :, None]
    out[f"{prefix}.bias"] = _f32(p["bias"])


def _feed_forward_to_torch(out: dict, p: dict, prefix: str) -> None:
    linear_to_torch(out, p["Dense_0"], f"{prefix}.net.0")
    linear_to_torch(out, p["Dense_1"], f"{prefix}.net.3")


def conformer_block_to_torch(out: dict, p: dict, prefix: str) -> None:
    """Inverse of ``conformer_block_params``."""
    conv = f"{prefix}.conv.net"
    layer_norm_to_torch(out, p["LayerNorm_0"], f"{prefix}.ff1.fn.norm")
    layer_norm_to_torch(out, p["LayerNorm_1"], f"{prefix}.attn.norm")
    layer_norm_to_torch(out, p["LayerNorm_2"], f"{prefix}.ff2.fn.norm")
    _feed_forward_to_torch(out, p["ff1"], f"{prefix}.ff1.fn.fn")
    _feed_forward_to_torch(out, p["ff2"], f"{prefix}.ff2.fn.fn")
    linear_to_torch(out, p["attn"]["to_q"], f"{prefix}.attn.fn.to_q", bias=False)
    linear_to_torch(out, p["attn"]["to_kv"], f"{prefix}.attn.fn.to_kv", bias=False)
    linear_to_torch(out, p["attn"]["to_out"], f"{prefix}.attn.fn.to_out")
    layer_norm_to_torch(out, p["conv"]["LayerNorm_0"], f"{conv}.0")
    _pointwise_to_torch(out, p["conv"]["pw_in"], f"{conv}.2")
    # depthwise (k,1,C) -> (C,1,k)
    out[f"{conv}.4.conv.weight"] = np.transpose(_f32(p["conv"]["dw_kernel"]), (2, 1, 0))
    out[f"{conv}.4.conv.bias"] = _f32(p["conv"]["dw_bias"])
    # ChanLayerNorm weight is (1, C, 1) in the reference (conformer.py:93)
    out[f"{conv}.6.weight"] = _f32(p["conv"]["ChanLayerNorm_0"]["weight"]).reshape(1, -1, 1)
    _pointwise_to_torch(out, p["conv"]["pw_out"], f"{conv}.7")
    layer_norm_to_torch(out, p["post_norm"], f"{prefix}.post_norm")


def conformer_to_torch(out: dict, params: dict, prefix: str, depth: int) -> None:
    """Our ``block_{i}`` tree -> reference ``Conformer.layers.{i}`` keys."""
    for i in range(depth):
        conformer_block_to_torch(out, params[f"block_{i}"], f"{prefix}.layers.{i}")
