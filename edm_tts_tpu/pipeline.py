"""One-dispatch end-to-end synthesis: text -> waveform in a single XLA program.

Chains the t2s MaskGIT sampler, the s2a sampler and the codec decoder inside
one ``jax.jit``, on a fixed ``max_speech_len`` canvas (reference call chain
/root/reference/inference.py:15-55, but with zero host round-trips between
stages — the reference crosses the host boundary after every model). The
staged path in ``inference.py`` pulls the predicted lengths to the host to
bucket the s2a canvas (cheaper when utterances are much shorter than
``max_speech_len``); this fused path trades that for a single device dispatch,
which wins whenever the canvas is close to fully used (benchmarks, fixed-
length batch synthesis) or dispatch latency dominates (tunnel/remote devices).

Correctness on the padded canvas: the s2a sampler receives the t2s validity
mask (``semantic_valid``) and excludes padded positions from attention and
conv (see ``InjectionConformer.forward_first_level`` pad_mask), so valid
positions compute exactly as on an exact-size canvas. Audio beyond
``lengths * hop`` is garbage and must be trimmed by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from edm_tts_tpu.models.s2a import InjectionConformer, s2a_sample
from edm_tts_tpu.models.t2s import TextToSemantic, t2s_sample

Array = jax.Array


@functools.partial(
    jax.jit,
    static_argnums=(0, 1),
    static_argnames=("pred_iters", "steps", "max_speech_len", "assume_full_canvas"),
)
def e2e_synthesize(
    t2s_model: TextToSemantic,
    s2a_model: InjectionConformer,
    t2s_params,
    s2a_params,
    text_tokens: Array,
    text_lengths: Array,
    prompt_acoustic: Array,
    prompt_semantic: Array,
    rng: Array,
    *,
    pred_iters: int = 16,
    steps: int = 8,
    temperature: float = 1.0,
    max_speech_len: int = 1250,
    gt_length: Array | None = None,
    assume_full_canvas: bool = False,
) -> dict[str, Array]:
    """Full zero-shot TTS as ONE jitted program.

    Args:
      text_tokens: ``(B, Lt)`` byte tokens + 5 (joint-vocab ids).
      text_lengths: ``(B,)`` valid text lengths.
      prompt_acoustic: ``(1 or B, Q, Tp)`` speaker prompt codes.
      prompt_semantic: ``(1 or B, Tp)`` speaker prompt semantic tokens.
      gt_length: optional ``(B,)`` ground-truth speech lengths.
    Returns dict with ``audio`` ``(B, max_speech_len * hop, 1)`` and
    ``lengths`` ``(B,)`` (valid samples per row = lengths * hop).
    """
    b = text_tokens.shape[0]
    k_t2s, k_s2a = jax.random.split(rng)

    t2s_out = t2s_sample(
        t2s_model, t2s_params, text_tokens, text_lengths, k_t2s,
        pred_iters=pred_iters, temperature=temperature,
        max_speech_len=max_speech_len, gt_length=gt_length,
    )

    # assume_full_canvas: caller guarantees every row uses the whole
    # max_speech_len span (e.g. fixed gt_length benchmarks) — skip the
    # pad-mask plumbing entirely, which costs measurably more than the two
    # device dispatches it replaces when the canvas is full anyway.
    valid = None if assume_full_canvas else t2s_out["valid"]
    codes = s2a_sample(
        s2a_model, s2a_params, t2s_out["semantic_tokens"],
        jnp.broadcast_to(prompt_acoustic, (b, *prompt_acoustic.shape[1:])),
        jnp.broadcast_to(prompt_semantic, (b, *prompt_semantic.shape[1:])),
        k_s2a, steps=steps, temperature=temperature,
        semantic_valid=valid,
    )

    audio = s2a_model.apply(
        s2a_params, codes, method=InjectionConformer.decode_audio
    )
    return {
        "audio": audio,
        "lengths": t2s_out["lengths"],
        "semantic_tokens": t2s_out["semantic_tokens"],
        "acoustic_codes": codes,
    }
