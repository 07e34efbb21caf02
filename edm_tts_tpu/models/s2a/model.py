"""Semantic->acoustic injection Conformer.

A 16-layer Conformer predicting all 12 RVQ acoustic levels in one stack, with
codec features of coarser levels injected at intermediate layers (4,7,10,13).
Re-designed TPU-first from the reference
(/root/reference/edm_tts/models/injection_conformer/
 modeling_injection_conformer.py and injection_conformer_wrapper.py):

- the frozen codec is an embedded flax submodule (parameter subtree
  ``codec``), so the dynamic-injection recursion — argmax of coarse logits ->
  codec ``codes_to_features`` -> re-inject, all inside one forward — is a
  pure jittable function, not an I/O boundary (wrapper.py:119-129);
- training masking uses a per-sample cosine-schedule Bernoulli mask
  (modeling:62-74) with an explicit PRNG key;
- the masked-CE loss is a dense masked mean (identical value to the
  reference's ``masked_select`` + mean CE, but static-shape);
- the MaskGIT level-0 sampling loop lives in ``sampler.py`` as a jitted
  ``lax.scan`` over the cosine schedule.

Layouts: semantic tokens ``(B, T)``; acoustic codes ``(B, Q, T)``; the
per-level logits head is a stacked einsum ``(B, T', Q, H) x (Q, H, N)``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from edm_tts_tpu.models.codec import Codec
from edm_tts_tpu.models.conformer.conformer import ConformerBlock, _remat_policy
from edm_tts_tpu.models.s2a.config import S2AConfig
from edm_tts_tpu.ops import (
    cosine_schedule_mask,
    embed_take,
    masked_cross_entropy,
    rope_frequencies,
)
from edm_tts_tpu.ops.qdense import QDense

Array = jax.Array


class FeatProj(nn.Module):
    """Linear + LayerNorm feature projection (acoustic D -> hidden H)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.dim, dtype=self.dtype)(x)
        return nn.LayerNorm(dtype=self.dtype)(x)


class InjectionConformer(nn.Module):
    cfg: S2AConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        h = cfg.hidden_size
        self.codec = Codec(cfg.codec, dtype=self.dtype)
        self.semantic_embedding = nn.Embed(cfg.num_semantic_tokens, h)
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0), (1, 1, h)
        )
        self.acoustic_feat_proj = FeatProj(h, dtype=self.dtype)
        self.blocks = [
            ConformerBlock(cfg.encoder_config, dtype=self.dtype, name=f"block_{i}")
            for i in range(cfg.encoder_num_layers)
        ]
        self.project_injection = [
            FeatProj(h, dtype=self.dtype, name=f"project_injection_{i}")
            for i in range(len(cfg.injection_layers))
        ]
        self.remaining_quantizers = cfg.num_quantizers - len(cfg.injection_layers)
        self.fine_head = QDense(
            h * self.remaining_quantizers, dtype=self.dtype, quantize=cfg.quantize
        )
        self.logits_norm = nn.LayerNorm(dtype=self.dtype)
        self.logits_w = self.param(
            "logits_w",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (cfg.num_quantizers, h, cfg.num_codevectors),
        )
        self.logits_b = self.param(
            "logits_b", nn.initializers.zeros, (cfg.num_quantizers, cfg.num_codevectors)
        )

    # -- logits heads --------------------------------------------------------
    def to_logits(self, x: Array) -> Array:
        """``(B, T, Q, H)`` -> ``(B, Q, T, N)``."""
        x = self.logits_norm(x)
        logits = (
            jnp.einsum("btqh,qhn->bqtn", x, self.logits_w.astype(x.dtype))
            + self.logits_b.astype(x.dtype)[None, :, None, :]
        )
        return logits

    def single_level_logits(self, x: Array, level: int) -> Array:
        """``(B, T, H)`` -> ``(B, T, N)`` for one quantizer level."""
        x = self.logits_norm(x)
        return x @ self.logits_w[level].astype(x.dtype) + self.logits_b[level].astype(
            x.dtype
        )

    # -- embedding helpers (used by the sampler) -----------------------------
    def embed_semantic(self, tokens: Array) -> Array:
        # gather forward + one-hot-matmul backward (see ops/embedding.py)
        return embed_take(self.semantic_embedding.embedding, tokens).astype(
            self.dtype
        )

    def mask_token_value(self) -> Array:
        return self.mask_token.astype(self.dtype)

    def project_acoustic(self, features: Array) -> Array:
        """Acoustic feature projection (level-0 features -> hidden)."""
        return self.acoustic_feat_proj(features.astype(self.dtype))

    def acoustic_features_unreduced(self, codes: Array) -> Array:
        """``(B, Q', T)`` -> frozen per-level codec features ``(B, Q', T, D)``."""
        return jax.lax.stop_gradient(self.codec.codes_to_features_unreduced(codes))

    def acoustic_features(self, codes: Array) -> Array:
        """``(B, Q', T)`` -> frozen summed codec features ``(B, T, D)``."""
        return jax.lax.stop_gradient(self.codec.codes_to_features(codes))

    def decode_audio(self, codes: Array) -> Array:
        return self.codec.decode_from_codes(codes)

    # -- forward passes ------------------------------------------------------
    def forward_first_level(
        self, x: Array, pad_mask: Array | None = None
    ) -> Array:
        """Run blocks up to the first injection layer; return level-0 logits
        ``(B, L, N)`` (reference wrapper.py:65-90).

        ``pad_mask`` (bool ``(B, L)``, True = valid) masks both attention keys
        and the conv modules so a padded canvas computes bit-identically to an
        exact-size one at valid positions (fused fixed-canvas inference)."""
        rope = rope_frequencies(x.shape[-2], self.cfg.encoder_config.dim_head)
        first = self.cfg.injection_layers[0]
        for i in range(first + 1):
            x = self.blocks[i](x, rope=rope, mask=pad_mask, conv_pad_mask=pad_mask)
        return self.single_level_logits(x, 0)

    def _run_stack(
        self,
        x: Array,
        *,
        teacher_injections: Array | None = None,
        prompt_injections: Array | None = None,
        mask_time: Array | None = None,
        pad_mask: Array | None = None,
        train: bool = False,
    ) -> tuple[Array, list[Array]]:
        """Shared 16-block walk. Returns (final hidden, coarse pre-injection
        outputs). Exactly one of teacher_injections (training, (Q_c, B, L, D))
        / dynamic injection (inference) is active when use_injection."""
        cfg = self.cfg
        rope = rope_frequencies(x.shape[-2], cfg.encoder_config.dim_head)
        inj_layers: Sequence[int] = cfg.injection_layers
        coarse_outputs: list[Array] = []
        coarse_logits: list[Array] = []

        import flax.linen as _nn

        def apply_block(mdl, x, rope):
            return mdl(
                x, rope=rope, mask=pad_mask, conv_pad_mask=pad_mask, train=train
            )

        if cfg.gradient_checkpointing and train:
            # same policy semantics as Conformer.remat_policy (conformer.py)
            apply_block = _nn.remat(
                apply_block, policy=_remat_policy(cfg.remat_policy)
            )

        for i, block in enumerate(self.blocks):
            cur = apply_block(block, x, rope)
            if i in inj_layers:
                idx = inj_layers.index(i)
                residual = (
                    coarse_outputs[-1] if (coarse_outputs and cfg.residual) else 0.0
                )
                coarse_outputs.append(cur)
                if cfg.use_injection:
                    if teacher_injections is not None:
                        inj = self.project_injection[idx](
                            teacher_injections[idx].astype(self.dtype)
                        )
                        cur = cur + inj + residual
                    else:
                        coarse_logits.append(self.single_level_logits(cur, idx))
                        tokens = jnp.argmax(jnp.stack(coarse_logits, axis=1), axis=-1)
                        injection = self.acoustic_features(tokens)
                        if prompt_injections is not None and mask_time is not None:
                            injection = jnp.where(
                                mask_time[:, :, None],
                                injection,
                                prompt_injections[idx],
                            )
                        elif prompt_injections is not None and idx < len(
                            prompt_injections
                        ):
                            injection = prompt_injections[idx]
                        cur = cur + self.project_injection[idx](
                            injection.astype(self.dtype)
                        ) + residual
                else:
                    cur = cur + residual
            x = cur
        return x, coarse_outputs

    def forward_logits(
        self,
        x: Array,
        *,
        teacher_injections: Array | None = None,
        prompt_injections: Array | None = None,
        mask_time: Array | None = None,
        pad_mask: Array | None = None,
        generated_start: int = 0,
        train: bool = False,
    ) -> Array:
        """Full stack -> all-level logits ``(B, Q, L', N)`` where L' drops the
        first ``generated_start`` (prompt) positions."""
        final, coarse = self._run_stack(
            x,
            teacher_injections=teacher_injections,
            prompt_injections=prompt_injections,
            mask_time=mask_time,
            pad_mask=pad_mask,
            train=train,
        )
        if generated_start:
            final = final[:, generated_start:]
            coarse = [c[:, generated_start:] for c in coarse]
        b, t, h = final.shape
        fine = self.fine_head(final).reshape(b, t, self.remaining_quantizers, h)
        stacked = jnp.concatenate(
            [jnp.stack(coarse, axis=2), fine], axis=2
        )  # (B, T, Q, H)
        return self.to_logits(stacked)

    # -- training ------------------------------------------------------------
    def __call__(
        self,
        acoustic_tokens: Array,
        semantic_tokens: Array,
        *,
        mask_rng: Array,
        mask_override: Array | None = None,
        train: bool = True,
    ) -> dict[str, Array]:
        """Masked-LM training forward (reference modeling:76-128).

        Args:
          acoustic_tokens: ``(B, Q, T)`` int codes.
          semantic_tokens: ``(B, T)`` int tokens.
          mask_override: optional explicit ``(B, T)`` bool mask replacing the
            cosine-schedule draw — used by the differential train-loss
            parity tests to inject the same mask on both sides.
        """
        cfg = self.cfg
        b, t = semantic_tokens.shape
        sem = self.embed_semantic(semantic_tokens)
        ac_unred = self.acoustic_features_unreduced(acoustic_tokens)  # (B,Q,T,D)
        ac0 = self.acoustic_feat_proj(ac_unred[:, 0].astype(self.dtype))

        if mask_override is not None:
            mask = mask_override
        else:
            mask = cosine_schedule_mask(mask_rng, b, t)
        enc_in = jnp.where(
            mask[:, :, None], sem + self.mask_token_value(), sem + ac0
        )

        cum = jnp.cumsum(ac_unred, axis=1)  # (B,Q,T,D)
        teacher = jnp.stack(
            [cum[:, idx] for idx in range(len(cfg.injection_layers))], axis=0
        )  # (Qc,B,T,D)

        logits = self.forward_logits(
            enc_in, teacher_injections=teacher, train=train
        )  # (B,Q,T,N)

        targets = acoustic_tokens.astype(jnp.int32)
        loss_mask = (
            jnp.ones(targets.shape, bool)
            if cfg.loss_all
            else jnp.broadcast_to(mask[:, None, :], targets.shape)
        )
        loss = masked_cross_entropy(logits, targets, loss_mask)

        return {
            "loss": loss,
            "output_acoustic_codes": jnp.argmax(logits, axis=-1),
            "target_acoustic_codes": acoustic_tokens,
            "mask": mask,
        }
