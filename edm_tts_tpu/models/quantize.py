"""Offline weight-only int8 quantization of trained checkpoints.

Converts a float (f32/bf16) parameter tree into the tree a
``quantize="int8"`` model expects: every ``QDense`` site whose shape the
int8 kernel can tile (ops/qdense.py) swaps its ``kernel`` for
``kernel_q`` (int8) + ``kernel_scale`` (f32 per output channel); everything
else — biases, LayerNorms, embeddings, conv kernels, the frozen codec —
passes through unchanged.

The target structure is derived from the quantized model itself via
``jax.eval_shape`` of its ``init``, so the converter always agrees with the
static per-layer decisions QDense makes (unquantizable shapes keep their
float kernel). This is a beyond-reference serving feature (the reference
runs torch bf16 autocast only, /root/reference/inference.py:33); it is
default-off and never used in training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from edm_tts_tpu.ops.qdense import quantize_weight


def quantize_tree(template: Any, src: Any) -> Any:
    """Rebuild ``src`` (float params) in the structure of ``template`` (the
    abstract param tree of the int8 model): dict nodes holding
    ``kernel_q``/``kernel_scale`` are quantized from the same-path float
    ``kernel``; all other leaves pass through (shapes checked)."""
    if isinstance(template, Mapping):
        if "kernel_q" in template:
            w = src["kernel"]
            tq = template["kernel_q"]
            if tuple(tq.shape) != tuple(w.shape):
                raise ValueError(
                    f"quantize_tree: kernel shape {tuple(w.shape)} != "
                    f"expected {tuple(tq.shape)}"
                )
            q, scale = quantize_weight(w)
            out = {"kernel_q": q, "kernel_scale": scale}
            for k, v in template.items():
                if k not in ("kernel_q", "kernel_scale"):
                    out[k] = quantize_tree(v, src[k])
            return out
        return {k: quantize_tree(v, src[k]) for k, v in template.items()}
    if hasattr(template, "shape") and hasattr(src, "shape"):
        if tuple(template.shape) != tuple(src.shape):
            raise ValueError(
                f"quantize_tree: leaf shape {tuple(src.shape)} != "
                f"expected {tuple(template.shape)}"
            )
    return src


def _quantized_cfg(cfg, mode):
    return dataclasses.replace(cfg, quantize=mode)


def quantize_s2a(model, params, mode: str = "int8"):
    """(InjectionConformer, float params) -> (int8 model, int8 params).

    ``mode``: "int8" (weight-only) or "w8a8" — same converted param tree,
    different forward dispatch (ops/qdense.py)."""
    from edm_tts_tpu.models.s2a import InjectionConformer

    cfg = _quantized_cfg(model.cfg, mode)
    q_model = InjectionConformer(cfg, dtype=model.dtype)
    template = jax.eval_shape(
        lambda: q_model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.num_quantizers, 8), jnp.int32),
            jnp.zeros((1, 8), jnp.int32),
            mask_rng=jax.random.PRNGKey(0),
            train=False,
        )
    )
    # the frozen codec passes through untouched, whatever subset the source
    # tree carries (full codec from utils/hub.py::load_s2a; encoder+quantizer
    # only when params came straight from a training-forward init)
    template["params"]["codec"] = params["params"]["codec"]
    return q_model, quantize_tree(template, params)


def quantize_t2s(model, params, mode: str = "int8"):
    """(TextToSemantic, float params) -> (int8 model, int8 params).

    ``mode``: "int8" (weight-only) or "w8a8" — same converted param tree,
    different forward dispatch (ops/qdense.py)."""
    from edm_tts_tpu.models.t2s import TextToSemantic

    cfg = _quantized_cfg(model.cfg, mode)
    q_model = TextToSemantic(cfg, dtype=model.dtype)
    b, l, lt = 1, 16, 4
    template = jax.eval_shape(
        lambda: q_model.init(
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
    return q_model, quantize_tree(template, params)
