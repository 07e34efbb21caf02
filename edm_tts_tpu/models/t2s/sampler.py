"""MaskGIT sampler for the text->semantic stage, as a jitted lax.scan.

Re-expresses the reference ``TextToSemanticWLen.infer``
(/root/reference/edm_tts/models/text_to_semantic/modeling_text_to_semantic.py:184-267)
as a pure batched static-shape function:

- the canvas ``[TEXT] text [SEP] [SPEECH] <mask>*len [SEP]`` is built with
  iota arithmetic on a static ``max_speech_len`` grid, with per-sample
  dynamic text/speech lengths — no dynamic shapes under jit;
- length comes from the log-space length predictor (exp -> ceil, :199-203)
  unless ``gt_length`` is given;
- ``pred_iters - 1`` sampling+re-masking iterations run as one ``lax.scan``;
  the final iteration argmaxes and (reference parity) *overwrites the whole
  speech span*, not just still-masked positions (:236-238) — note this
  differs from the s2a sampler which freezes committed positions;
- ``mask_len = max(1, min(floor(len * ratio), len))`` — the t2s clamp
  variant (:245-247);
- gumbel temperature annealed by the current mask ratio (:258).

Returns raw semantic ids in [0, 1024) plus a validity mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from edm_tts_tpu.models.t2s.config import SPECIAL_TOKENS
from edm_tts_tpu.models.t2s.model import TextToSemantic
from edm_tts_tpu.ops import random_topk_mask, sampling_mask_ratios

Array = jax.Array


def build_canvas(
    text_tokens: Array,
    text_lengths: Array,
    speech_lengths: Array,
    max_speech_len: int,
) -> tuple[Array, Array, Array]:
    """Build the joint canvas, attention mask and speech-span mask.

    Args:
      text_tokens: ``(B, Lt)`` byte tokens already shifted by num_special (+5).
      text_lengths: ``(B,)`` ints.
      speech_lengths: ``(B,)`` ints (clipped to max_speech_len).
    Returns (canvas ``(B, L)``, attention ``(B, L)``, speech_span ``(B, L)``)
    with ``L = Lt + 4 + max_speech_len``.
    """
    b, lt = text_tokens.shape
    l = lt + 4 + max_speech_len
    pos = jnp.arange(l)[None, :]
    tl = text_lengths[:, None]
    sl = speech_lengths[:, None]

    is_text = (pos >= 1) & (pos < 1 + tl)
    text_at_pos = jnp.take_along_axis(
        text_tokens, jnp.clip(pos - 1, 0, lt - 1), axis=1
    )
    speech_span = (pos >= 3 + tl) & (pos < 3 + tl + sl)

    canvas = jnp.where(pos == 0, SPECIAL_TOKENS["text"], 0)
    canvas = jnp.where(is_text, text_at_pos, canvas)
    canvas = jnp.where(pos == 1 + tl, SPECIAL_TOKENS["sep"], canvas)
    canvas = jnp.where(pos == 2 + tl, SPECIAL_TOKENS["speech"], canvas)
    canvas = jnp.where(speech_span, SPECIAL_TOKENS["mask"], canvas)
    canvas = jnp.where(pos == 3 + tl + sl, SPECIAL_TOKENS["sep"], canvas)
    attention = pos <= 3 + tl + sl
    return canvas.astype(jnp.int32), attention, speech_span


@functools.partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("pred_iters", "max_speech_len", "greedy"),
)
def t2s_sample(
    model: TextToSemantic,
    params,
    text_tokens: Array,
    text_lengths: Array,
    rng: Array,
    *,
    pred_iters: int = 16,
    temperature: float = 1.0,
    max_speech_len: int = 1250,
    gt_length: Array | None = None,
    greedy: bool = False,
) -> dict[str, Array]:
    """Batched text->semantic generation.

    Args:
      text_tokens: ``(B, Lt)`` byte tokens + 5 (joint-vocab text ids).
      text_lengths: ``(B,)`` number of valid text tokens per row.
      gt_length: optional ``(B,)`` ground-truth speech lengths.
    Returns dict with ``semantic_tokens`` ``(B, max_speech_len)`` in
    [0, 1024), ``lengths`` ``(B,)``, and ``valid`` ``(B, max_speech_len)``.
    """
    apply = functools.partial(model.apply, params)
    cfg = model.cfg
    b, lt = text_tokens.shape
    offset = cfg.semantic_offset

    text_mask = jnp.arange(lt)[None, :] < text_lengths[:, None]
    if gt_length is None:
        log_len = apply(
            text_tokens, text_mask, mask_conv=True,
            method=TextToSemantic.predict_log_length,
        )
        lengths = jnp.ceil(jnp.exp(log_len.astype(jnp.float32))).astype(jnp.int32)
    else:
        lengths = gt_length.astype(jnp.int32)
    lengths = jnp.clip(lengths, 1, max_speech_len)

    canvas, attention, speech_span = build_canvas(
        text_tokens, text_lengths, lengths, max_speech_len
    )

    def logits_fn(tokens):
        emb = apply(tokens, method=TextToSemantic.embed)
        # conv_pad_mask: padded canvas computes exactly like the reference's
        # exact-size one (inference-only conv masking, see ConvModule)
        return apply(
            emb, attention, conv_pad_mask=attention,
            method=TextToSemantic.embeddings_to_logits,
        )  # (B, L, V_sem)

    ratios = sampling_mask_ratios(pred_iters)
    init_num = lengths.astype(jnp.float32)

    def body(carry, xs):
        sampled_tokens, mask = carry
        ratio, key = xs
        k_sample, k_mask = jax.random.split(key)
        logits = logits_fn(sampled_tokens)
        # greedy: argmax instead of categorical draws — a deterministic mode
        # used by the differential sampler-parity tests (the reference loop
        # is made greedy the same way by patching torch Categorical)
        if greedy:
            sampled = jnp.argmax(logits, axis=-1)
        else:
            sampled = jax.random.categorical(k_sample, logits, axis=-1)

        mask_len = jnp.floor(init_num * ratio)
        mask_len = jnp.maximum(1.0, jnp.minimum(mask_len, init_num))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        selected = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        selected = jnp.where(mask, selected, jnp.inf)
        next_mask = random_topk_mask(
            k_mask, mask_len, selected, temperature=temperature * ratio
        )
        new_tokens = jnp.where(
            next_mask, SPECIAL_TOKENS["mask"], sampled + offset
        )
        sampled_tokens = jnp.where(speech_span, new_tokens, canvas)
        return (sampled_tokens, next_mask), None

    keys = jax.random.split(rng, max(pred_iters - 1, 1))
    if pred_iters > 1:
        (sampled_tokens, _), _ = jax.lax.scan(
            body, (canvas, speech_span), (ratios[: pred_iters - 1], keys)
        )
    else:
        sampled_tokens = canvas

    # final iteration: argmax over the whole span (reference :236-238)
    final = jnp.argmax(logits_fn(sampled_tokens), axis=-1)

    # extract the speech span into a left-aligned (B, max_speech_len) buffer
    span_pos = 3 + text_lengths[:, None] + jnp.arange(max_speech_len)[None, :]
    tokens = jnp.take_along_axis(final, jnp.clip(span_pos, 0, final.shape[1] - 1), axis=1)
    valid = jnp.arange(max_speech_len)[None, :] < lengths[:, None]
    return {
        "semantic_tokens": jnp.where(valid, tokens, 0).astype(jnp.int32),
        "lengths": lengths,
        "valid": valid,
    }
