"""MaskGIT sampler for the semantic->acoustic stage, as a jitted lax.scan.

Re-expresses the reference's Python sampling loop
(/root/reference/edm_tts/models/injection_conformer/
 modeling_injection_conformer.py:130-230 — ``infer_special``) as a pure
function: ``steps-1`` confidence-based re-masking iterations compiled into a
single ``lax.scan`` over the cosine schedule (the in-place ``encoder_input``
mutation becomes the scan carry), a final argmax pass, then one full 16-layer
forward with dynamic injection. The whole sampler jits into one XLA program —
this is the headline speed win over the Python-loop reference.

Semantics preserved:
- schedule ``cos(pi/2 * (t+1)/steps)``; gumbel temperature annealed by the
  current mask ratio (:175, :212);
- ``mask_len = max(1, min(sum(mask)-1, floor(T * ratio)))`` (:200-202);
- non-final steps sample categorically, final step argmaxes (:183-198);
- already-fixed positions carry ``+inf`` confidence (:208);
- prompt positions are never re-masked and their injections come from the
  prompt's ground-truth codec features (:146-168).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from edm_tts_tpu.models.s2a.model import InjectionConformer
from edm_tts_tpu.ops import (
    positional_categorical,
    positional_gumbel,
    random_topk_mask,
    sampling_mask_ratios,
)

Array = jax.Array


@functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("steps", "greedy")
)
def s2a_sample(
    model: InjectionConformer,
    params,
    semantic_tokens: Array,
    acoustic_prompt_tokens: Array | None,
    semantic_prompt_tokens: Array | None,
    rng: Array,
    *,
    steps: int = 8,
    temperature: float = 1.0,
    semantic_valid: Array | None = None,
    greedy: bool = False,
) -> Array:
    """Zero-shot semantic->acoustic generation.

    Args:
      semantic_tokens: ``(B, T)`` target semantic tokens.
      acoustic_prompt_tokens: ``(B, Q, Tp)`` speaker prompt codes or None.
      semantic_prompt_tokens: ``(B, Tp)`` speaker prompt semantic tokens.
      semantic_valid: optional bool ``(B, T)`` — True at real semantic
        positions. Enables a fixed-size (padded) canvas: invalid positions
        are excluded from attention/conv (pad_mask) and from the MaskGIT
        schedule, so valid positions compute as if the canvas were
        exact-size. Codes at invalid positions are garbage — trim downstream.
    Returns ``(B, Q, T)`` generated acoustic codes.
    """
    apply = functools.partial(model.apply, params)
    cfg = model.cfg
    b, t = semantic_tokens.shape

    sem = apply(semantic_tokens, method=InjectionConformer.embed_semantic)
    mask_tok = apply(method=InjectionConformer.mask_token_value)

    enc_gen = sem + mask_tok
    prompt_injections = None
    mask_time = None
    enc_prompt = None
    tp = 0

    if acoustic_prompt_tokens is not None and semantic_prompt_tokens is not None:
        tp = acoustic_prompt_tokens.shape[-1]
        sem_p = apply(
            semantic_prompt_tokens, method=InjectionConformer.embed_semantic
        )
        ac_p = apply(
            acoustic_prompt_tokens,
            method=InjectionConformer.acoustic_features_unreduced,
        )  # (B, Q, Tp, D)
        ac_p0 = apply(ac_p[:, 0], method=InjectionConformer.project_acoustic)
        enc_prompt = sem_p + ac_p0

        n_inj = min(len(cfg.injection_layers), acoustic_prompt_tokens.shape[1])
        cum = jnp.cumsum(ac_p, axis=1)
        zeros_pad = jnp.zeros((b, t, ac_p.shape[-1]), dtype=ac_p.dtype)
        prompt_injections = jnp.stack(
            [jnp.concatenate([cum[:, i], zeros_pad], axis=1) for i in range(n_inj)],
            axis=0,
        )  # (n_inj, B, Tp+T, D)
        mask_time = jnp.concatenate(
            [jnp.zeros((b, tp), bool), jnp.ones((b, t), bool)], axis=1
        )

    pad_mask = None
    if semantic_valid is not None:
        pad_mask = jnp.concatenate(
            [jnp.ones((b, tp), bool), semantic_valid], axis=1
        ) if tp else semantic_valid

    def full_input(enc_gen):
        if enc_prompt is None:
            return enc_gen
        return jnp.concatenate([enc_prompt, enc_gen], axis=1)

    def first_level_logits(enc_gen):
        logits = apply(
            full_input(enc_gen), pad_mask,
            method=InjectionConformer.forward_first_level,
        )
        return logits[:, tp:]

    if steps > 1:
        ratios = sampling_mask_ratios(steps)
        if semantic_valid is None:
            init_num = jnp.full((b,), t, dtype=jnp.float32)
            init_mask = jnp.ones((b, t), bool)
        else:
            init_num = jnp.sum(semantic_valid, axis=-1).astype(jnp.float32)
            init_mask = semantic_valid

        def body(carry, xs):
            enc_gen, mask = carry
            ratio, key = xs
            k_sample, k_mask = jax.random.split(key)
            logits = first_level_logits(enc_gen)  # (B, T, N)
            # counter-based per-position randoms: the draw at a position is
            # independent of the canvas length, so a bucket-padded canvas
            # samples bit-identically to the exact-size one (see
            # ops/masking.positional_keys)
            # greedy: argmax instead of categorical draws — deterministic
            # mode for the differential sampler-parity tests
            if greedy:
                sampled = jnp.argmax(logits, axis=-1)
            else:
                sampled = positional_categorical(k_sample, logits)
            feats = apply(
                sampled[:, None, :], method=InjectionConformer.acoustic_features
            )
            proj = apply(feats, method=InjectionConformer.project_acoustic)
            enc_gen = jnp.where(mask[:, :, None], sem + proj, enc_gen)

            mask_len = jnp.floor(init_num * ratio)
            mask_len = jnp.maximum(
                jnp.ones_like(mask_len),
                jnp.minimum(jnp.sum(mask, axis=-1) - 1.0, mask_len),
            )
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            selected = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
            selected = jnp.where(mask, selected, jnp.inf)
            next_mask = random_topk_mask(
                k_mask, mask_len, selected, temperature=temperature * ratio,
                gumbel=positional_gumbel(k_mask, b, t),
            )
            enc_gen = jnp.where(next_mask[:, :, None], sem + mask_tok, enc_gen)
            return (enc_gen, next_mask), None

        keys = jax.random.split(rng, steps - 1)
        (enc_gen, mask), _ = jax.lax.scan(
            body,
            (enc_gen, init_mask),
            (ratios[: steps - 1], keys),
        )

        # final iteration: argmax instead of sampling (:183-190)
        logits = first_level_logits(enc_gen)
        ids = jnp.argmax(logits, axis=-1)
        feats = apply(ids[:, None, :], method=InjectionConformer.acoustic_features)
        proj = apply(feats, method=InjectionConformer.project_acoustic)
        enc_gen = jnp.where(mask[:, :, None], sem + proj, enc_gen)

    all_logits = apply(
        full_input(enc_gen),
        prompt_injections=prompt_injections,
        mask_time=mask_time,
        pad_mask=pad_mask,
        generated_start=tp,
        method=InjectionConformer.forward_logits,
    )  # (B, Q, T, N)
    return jnp.argmax(all_logits, axis=-1)
