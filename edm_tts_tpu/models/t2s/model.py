"""Text->semantic masked-token Conformer with length prediction.

Re-design of the reference TextToSemanticWLen
(/root/reference/edm_tts/models/text_to_semantic/modeling_text_to_semantic.py)
for static-shape TPU execution:

- the reference's per-sample Python span-splitting loop (:77-109, `.nonzero`
  scanning) moves to the host-side collator, which ships ``speech_mask`` /
  ``text_ids`` / ``speech_lengths`` alongside the padded joint sequence; the
  jitted forward is pure dense masked compute;
- training masking: ONE cosine-schedule draw per sample shared across the
  sequence (:64-75), restricted to the speech span;
- CE over masked speech positions with targets shifted to semantic vocab
  (:126-134). The reference's ``CrossEntropyLoss(ignore_index=0)`` on
  *shifted* targets silently drops semantic token 0 from the loss — a quirk
  we preserve deliberately (documented; toggle ``ignore_semantic_zero``);
- length target/prediction in log space (:107, :203);
- the padding-idx-0 embedding row is pinned to zero functionally (torch
  ``padding_idx`` parity) by masking the lookup.

The MaskGIT ``infer`` loop lives in ``sampler.py`` as a jitted lax.scan.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from edm_tts_tpu.models.conformer.conformer import Conformer
from edm_tts_tpu.models.t2s.config import SPECIAL_TOKENS, T2SConfig
from edm_tts_tpu.ops import embed_take, masked_cross_entropy
from edm_tts_tpu.ops.qdense import QDense

Array = jax.Array


class TextToSemantic(nn.Module):
    cfg: T2SConfig
    dtype: Any = jnp.float32
    ignore_semantic_zero: bool = True  # reference quirk parity

    def setup(self):
        cfg = self.cfg
        self.input_embedding = nn.Embed(cfg.total_num_tokens, cfg.hidden_size)
        self.conformer = Conformer(cfg.main_encoder_config, dtype=self.dtype)
        self.length_token = self.param(
            "length_token", nn.initializers.normal(1.0), (1, 1, cfg.hidden_size)
        )
        self.length_predictor = Conformer(
            cfg.length_predictor_config, dtype=self.dtype
        )
        self.pred_dense = QDense(
            cfg.hidden_size, dtype=self.dtype, quantize=cfg.quantize
        )
        self.pred_norm = nn.LayerNorm(dtype=self.dtype)
        self.pred_head = QDense(
            cfg.semantic_vocab_size, dtype=self.dtype, quantize=cfg.quantize
        )
        self.length_pred_head = nn.Dense(1, dtype=self.dtype)

    # -- embedding (padding_idx=0 parity) ------------------------------------
    def embed(self, tokens: Array) -> Array:
        # embed_take = gather forward + one-hot-matmul backward (the scatter
        # backward of a plain lookup serializes on TPU at 44k-token canvases)
        e = embed_take(self.input_embedding.embedding, tokens).astype(self.dtype)
        return e * (tokens != SPECIAL_TOKENS["pad"])[..., None].astype(e.dtype)

    # -- heads ---------------------------------------------------------------
    def _pred_transform(self, x: Array) -> Array:
        x = self.pred_dense(x)
        x = jax.nn.gelu(x, approximate=True)
        return self.pred_norm(x)

    def embeddings_to_logits(
        self,
        embeddings: Array,
        attention_mask: Array | None = None,
        *,
        conv_pad_mask: Array | None = None,
        train: bool = False,
    ) -> Array:
        """``(B, L, H)`` -> semantic logits ``(B, L, V_sem)``
        (reference :146-162, without the masked gather — dense).

        ``conv_pad_mask`` is the inference-only extension (see
        ConvModule): the sampler passes it so a padded canvas computes
        exactly like the reference's exact-size batch-1 canvas; training
        leaves it None to preserve the reference's unmasked-conv behavior
        on padded batches.
        """
        out = self.conformer(
            embeddings, mask=attention_mask, conv_pad_mask=conv_pad_mask,
            train=train,
        )
        return self.pred_head(self._pred_transform(out))

    def predict_log_length(
        self,
        text_ids: Array,
        text_mask: Array | None = None,
        *,
        mask_conv: bool = False,
        train: bool = False,
    ) -> Array:
        """[LEN] + text embeds -> predicted log speech length ``(B,)``.

        ``mask_conv=True`` (inference) zeroes padded positions before the
        depthwise convs so a right-padded text batch predicts exactly like
        the reference's exact-size batch-1 input; training keeps the
        reference's unmasked-conv behavior on padded batches.
        """
        b = text_ids.shape[0]
        text_emb = self.embed(text_ids)
        inp = jnp.concatenate(
            [jnp.broadcast_to(self.length_token.astype(self.dtype), (b, 1, text_emb.shape[-1])), text_emb],
            axis=1,
        )
        mask = None
        if text_mask is not None:
            mask = jnp.concatenate(
                [jnp.ones((b, 1), bool), text_mask.astype(bool)], axis=1
            )
        out = self.length_predictor(
            inp, mask=mask, conv_pad_mask=mask if mask_conv else None,
            train=train,
        )
        return self.length_pred_head(out[:, 0])[..., 0]

    def extract_features(
        self,
        input_ids: Array,
        attention_mask: Array | None = None,
        output_layer_idx: int | None = None,
        return_attn: bool = False,
    ):
        """Main-encoder hidden states, optionally with per-layer attention
        maps (reference ``extract_features`` :163-182)."""
        return self.conformer(
            self.embed(input_ids), mask=attention_mask,
            output_layer_idx=output_layer_idx, return_attn=return_attn,
        )

    # -- training ------------------------------------------------------------
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Array,
        speech_mask: Array,
        text_ids: Array,
        text_attention_mask: Array,
        speech_lengths: Array,
        *,
        mask_rng: Array,
        mask_override: Array | None = None,
        train: bool = True,
    ) -> dict[str, Array]:
        """Masked-LM + length loss training forward.

        Args (all host-collated, static shape):
          input_ids: ``(B, L)`` joint ``[TEXT] bytes [SEP] [SPEECH] sem [SEP]``.
          attention_mask: ``(B, L)`` valid positions.
          speech_mask: ``(B, L)`` bool, True on the semantic-token span.
          text_ids: ``(B, Lt)`` text byte tokens (shifted by num_special).
          speech_lengths: ``(B,)`` float speech-span lengths.
          mask_override: optional explicit ``(B, L)`` bool mask replacing the
            cosine-schedule draw — used by the differential train-loss
            parity tests to inject the same mask on both sides.
        """
        cfg = self.cfg
        b, l = input_ids.shape

        if mask_override is not None:
            mask = mask_override & speech_mask
        else:
            u_key, b_key = jax.random.split(mask_rng)
            u = jax.random.uniform(u_key, (b, 1), minval=0.0, maxval=math.pi / 2)
            mask = (jax.random.uniform(b_key, (b, l)) < jnp.cos(u)) & speech_mask

        mask_tok = jnp.asarray(SPECIAL_TOKENS["mask"], input_ids.dtype)
        masked_input = jnp.where(mask, mask_tok, input_ids)

        logits = self.embeddings_to_logits(
            self.embed(masked_input), attention_mask, train=train
        )  # (B, L, V_sem)

        targets = input_ids - cfg.semantic_offset
        loss_mask = mask
        if self.ignore_semantic_zero:
            loss_mask = loss_mask & (targets != 0)
        safe_targets = jnp.clip(targets, 0, cfg.semantic_vocab_size - 1)
        ce_loss = masked_cross_entropy(logits, safe_targets, loss_mask)

        length_pred = self.predict_log_length(
            text_ids, text_attention_mask, train=train
        )
        length_loss = jnp.mean(
            jnp.abs(length_pred - jnp.log(speech_lengths.astype(jnp.float32)))
        )

        return {
            "loss": ce_loss + length_loss,
            "ce_loss": ce_loss,
            "length_loss": length_loss,
            "mask": mask,
        }
