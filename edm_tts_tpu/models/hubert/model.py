"""HuBERT encoder in flax (wav2vec2-family, inference path).

A from-scratch JAX implementation of the frozen feature extractor the
reference loads via HF ``AutoModel.from_pretrained("facebook/hubert-large-
ll60k")`` (semantic_tokenizer_hubert.py:23). Weight-exact with the HF torch
implementation (see ``convert.py`` + parity test): the semantic tokens are
``argmin cdist(hidden_states[18], kmeans_centers)`` and the layer-18 hidden
states must match to tolerance for token bit-parity.

Structure (hubert-large-ll60k):
- conv feature extractor: 7 layers (k/s: 10/5, 3/2 x4, 2/2 x2), no padding,
  LayerNorm over channels after each conv ("layer" norm mode), GELU;
- feature projection: LayerNorm -> Dense(1024);
- conv positional embedding: k=128, pad 64, 16 groups, GELU, last frame
  dropped (even-kernel SamePad);
- 24 pre-LN transformer layers (do_stable_layer_norm), 16 heads, ff 4096;
  the final encoder LayerNorm is NOT applied to intermediate hidden states,
  so ``output_layer=18`` returns the raw block-18 output exactly as HF's
  ``hidden_states[18]``.

The model is frozen everywhere it is used; bf16 compute is configurable but
f32 is the default because k-means argmax near cluster boundaries is
sensitive (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from edm_tts_tpu.models.hubert.config import HubertConfig
from edm_tts_tpu.ops.attention import mha
from edm_tts_tpu.ops import conv1d

Array = jax.Array


class ConvFeatureExtractor(nn.Module):
    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """``(B, T)`` waveform -> ``(B, T', conv_dim[-1])`` features."""
        cfg = self.cfg
        h = x[..., None].astype(self.dtype)
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            kernel = self.param(
                f"conv_{i}_kernel",
                nn.initializers.he_normal(),
                (k, h.shape[-1], dim),
            )
            bias = None
            if cfg.conv_bias:
                bias = self.param(
                    f"conv_{i}_bias", nn.initializers.zeros, (dim,)
                ).astype(self.dtype)
            h = conv1d(h, kernel.astype(self.dtype), bias, stride=s)
            if cfg.feat_extract_norm == "layer":
                h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                 name=f"layer_norm_{i}")(h)
            elif cfg.feat_extract_norm == "group" and i == 0:
                h = nn.GroupNorm(num_groups=dim, epsilon=cfg.layer_norm_eps,
                                 dtype=self.dtype, name="group_norm")(h)
            h = jax.nn.gelu(h, approximate=False)
        return h


class PositionalConvEmbedding(nn.Module):
    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        k = cfg.num_conv_pos_embeddings
        groups = cfg.num_conv_pos_embedding_groups
        h = x.shape[-1]
        # stored as the *effective* (weight-norm-folded) kernel; the model is
        # inference-only so the g/v decomposition is folded at conversion
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (k, h // groups, h)
        )
        bias = self.param("bias", nn.initializers.zeros, (h,))
        y = conv1d(
            x, kernel.astype(self.dtype), bias.astype(self.dtype),
            padding=k // 2, groups=groups,
        )
        if k % 2 == 0:  # SamePad: drop the trailing frame
            y = y[:, :-1]
        return jax.nn.gelu(y, approximate=False)


class EncoderLayer(nn.Module):
    """Pre-LN (stable-layer-norm) transformer layer."""

    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, key_mask: Array | None = None) -> Array:
        cfg = self.cfg
        h = cfg.hidden_size
        heads = cfg.num_attention_heads
        d_head = h // heads

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm")(x)
        # HF scales q by d_head**-0.5 before the score einsum; ops.mha applies
        # the same scale internally, so q is passed unscaled here. The HF
        # additive -1e9 key bias == ops.mha's bool key-padding mask (both
        # underflow masked keys to exactly 0 probability in f32).
        q = nn.Dense(h, dtype=self.dtype, name="q_proj")(y)
        k = nn.Dense(h, dtype=self.dtype, name="k_proj")(y)
        v = nn.Dense(h, dtype=self.dtype, name="v_proj")(y)
        b, t, _ = y.shape
        q = q.reshape(b, t, heads, d_head)
        k = k.reshape(b, t, heads, d_head)
        v = v.reshape(b, t, heads, d_head)
        o = mha(q, k, v, mask=key_mask).reshape(b, t, h)
        x = x + nn.Dense(h, dtype=self.dtype, name="out_proj")(o)

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        y = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(h, dtype=self.dtype, name="fc2")(y)
        return x + y


class HubertModel(nn.Module):
    cfg: HubertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_values: Array,
        attention_mask: Array | None = None,
        *,
        output_layer: int | None = None,
    ) -> Array:
        """``(B, T)`` waveform -> hidden states after ``output_layer`` blocks
        (HF ``hidden_states[output_layer]`` semantics; None = all layers +
        final LN)."""
        cfg = self.cfg
        feats = ConvFeatureExtractor(cfg, self.dtype, name="feature_extractor")(
            input_values
        )
        if cfg.feat_proj_layer_norm:
            feats = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                                 name="feat_proj_layer_norm")(feats)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="feat_proj")(feats)

        feat_mask = None
        if attention_mask is not None:
            feat_mask_len = cfg.feature_lengths(jnp.sum(attention_mask, axis=-1))
            feat_mask = (
                jnp.arange(x.shape[1])[None, :] < feat_mask_len[:, None]
            )
            x = x * feat_mask[..., None].astype(x.dtype)

        x = x + PositionalConvEmbedding(cfg, self.dtype, name="pos_conv")(x)

        n_layers = cfg.num_hidden_layers if output_layer is None else output_layer
        for i in range(n_layers):
            x = EncoderLayer(cfg, self.dtype, name=f"layer_{i}")(x, feat_mask)
        if output_layer is None:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="encoder_layer_norm")(x)
        return x


def normalize_input(audio: Array, attention_mask: Array | None = None) -> Array:
    """Per-utterance zero-mean unit-variance normalization — the HF
    Wav2Vec2FeatureExtractor ``do_normalize=True`` preprocessing used by
    hubert-large-ll60k (semantic_tokenizer_hubert.py:58-62 goes through the
    HF feature extractor)."""
    audio = audio.astype(jnp.float32)
    if attention_mask is None:
        mean = jnp.mean(audio, axis=-1, keepdims=True)
        var = jnp.var(audio, axis=-1, keepdims=True)
    else:
        m = attention_mask.astype(jnp.float32)
        n = jnp.sum(m, axis=-1, keepdims=True)
        mean = jnp.sum(audio * m, axis=-1, keepdims=True) / n
        var = jnp.sum(jnp.square(audio - mean) * m, axis=-1, keepdims=True) / n
        audio = audio * m
    return (audio - mean) / jnp.sqrt(var + 1e-7)
