"""Semantic tokenizer: frozen HuBERT layer-18 features -> k-means codes.

Re-design of the reference SemanticModelHuBERT
(/root/reference/edm_tts/models/audio_tokenizer/semantic_tokenizer_hubert/
 semantic_tokenizer_hubert.py:12-90): HuBERT-large layer 18 hidden states,
nearest of K=1024 k-means centroids (``argmax(-cdist)`` == argmin L2), one
token per 320 input samples. Pure-function: params = {hubert params,
cluster_centers (K, H)}; everything jittable, bf16-able, shardable.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from edm_tts_tpu.models.hubert.config import HubertConfig
from edm_tts_tpu.models.hubert.model import HubertModel, normalize_input

Array = jax.Array


class SemanticTokenizerHubert:
    """Stateless wrapper pairing a HubertModel with k-means centroids."""

    def __init__(
        self,
        config: HubertConfig | None = None,
        output_layer: int = 18,
        dtype: Any = jnp.float32,
    ):
        self.config = config or HubertConfig()
        self.output_layer = min(output_layer, self.config.num_hidden_layers)
        self.model = HubertModel(self.config, dtype=dtype)
        self.sample_rate = 16000

    @property
    def downsample_factor(self) -> int:
        return self.config.downsample_factor

    def make_params(self, hubert_params: dict, cluster_centers) -> dict:
        """Bundle converted HuBERT params + ``(K, H)`` centroid matrix."""
        return {
            "hubert": hubert_params,
            "cluster_centers": jnp.asarray(cluster_centers, jnp.float32),
        }

    @functools.partial(jax.jit, static_argnums=(0,))
    def encode(
        self,
        params: dict,
        audio: Array,
        attention_mask: Array | None = None,
    ) -> Array:
        """``(B, T)`` raw waveform -> ``(B, T//320)`` semantic token ids.

        Applies the HF feature-extractor normalization (zero-mean/unit-var)
        then HuBERT layer-``output_layer`` and nearest-centroid assignment.
        """
        x = normalize_input(audio, attention_mask)
        hidden = self.model.apply(
            params["hubert"], x, attention_mask, output_layer=self.output_layer
        )  # (B, T', H)
        centers = params["cluster_centers"]
        # argmin squared L2 == reference argmax(-cdist) (cdist is p=2)
        d = (
            jnp.sum(hidden.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
            - 2.0 * jnp.einsum("bth,kh->btk", hidden.astype(jnp.float32), centers)
            + jnp.sum(centers**2, axis=-1)
        )
        return jnp.argmin(d, axis=-1).astype(jnp.int32)
