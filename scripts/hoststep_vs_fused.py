"""Equal-NFE ablation: reference-shaped host-stepped execution vs fused scan.

Grounds the BASELINE ">=10x MaskGIT at equal NFE" line ON the TPU, at equal
hardware / weights / shapes / NFE. The reference executes its samplers as
eager Python loops with host control flow:

- t2s: one Python iteration per MaskGIT step, each dispatching ~dozens of
  eager torch kernels (/root/reference/edm_tts/models/text_to_semantic/
  modeling_text_to_semantic.py:231-265), with dynamic-shape sync points
  (``mask_token.repeat(length_pred)`` :206, ``sampled_tokens[full_mask]``
  :267);
- s2a: the same loop shape (/root/reference/edm_tts/models/
  injection_conformer/modeling_injection_conformer.py:130-230);
- stage hops through host-visible tensors and a final ``.cpu()`` pull
  (/root/reference/inference.py:33-49).

This script renders that execution shape AS FAVORABLY AS POSSIBLE on the
TPU: each MaskGIT iteration is ONE pre-compiled XLA program (eager torch
would dispatch ~100 kernels per iteration), carries stay on device, and the
per-iteration host sync is a 4-byte scalar pull. Three variants:

1. ``hoststep``  — one program per iteration + host sync each step + host
   hop of the semantic tokens between stages (the reference shape);
2. ``queued``    — the same per-iteration programs queued back-to-back with
   no intermediate syncs (isolates program-count overhead from sync
   latency; torch CUDA streams approximate this when nothing forces a
   sync — the reference's dynamic-shape ops DO force them);
3. ``fused``     — the shipped single-dispatch ``e2e_synthesize`` scan.

The host-stepped path replicates the fused samplers' scan bodies with the
SAME PRNG key splits and math; outputs are NOT bit-identical to the fused
scan (XLA fuses the two program shapes differently, so bf16 rounding
diverges and near-tie argmaxes can flip) — shapes are asserted and the
token agreement rate is printed as the transparency artifact. Equal work,
different execution shape: the measured ratio is orchestration PLUS
whatever the axon tunnel adds to each host sync; the per-sync breakdown
printed below separates the two (see benchmarks/README.md).

Run: ``python scripts/hoststep_vs_fused.py`` (axon TPU, ~3 min incl compiles).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
from edm_tts_tpu.models.t2s.config import SPECIAL_TOKENS
from edm_tts_tpu.models.t2s.sampler import build_canvas
from edm_tts_tpu.ops import (
    positional_categorical,
    positional_gumbel,
    random_topk_mask,
    sampling_mask_ratios,
)
from edm_tts_tpu.pipeline import e2e_synthesize

PRED_ITERS = 16
STEPS = 8
GEN_SECONDS = 10.0
T_GEN = int(GEN_SECONDS * 50)
T_PROMPT = 150
TEXT_LEN = 100


def build_models(rng):
    dtype = jnp.bfloat16
    codec_cfg = CodecConfig()
    s2a_cfg = S2AConfig(codec=codec_cfg)
    t2s_cfg = T2SConfig(
        hidden_size=384, main_encoder_num_layers=12,
        main_encoder_num_heads=8, main_encoder_dim_head=24,
        length_predictor_num_heads=8, length_predictor_dim_head=24,
    )
    s2a = InjectionConformer(s2a_cfg, dtype=dtype)
    t2s = TextToSemantic(t2s_cfg, dtype=dtype)
    s2a_params = jax.jit(
        lambda r: s2a.init(
            r, jnp.zeros((1, 12, 8), jnp.int32), jnp.zeros((1, 8), jnp.int32),
            mask_rng=r, train=False,
        )
    )(rng)
    codec = Codec(codec_cfg, dtype=dtype)
    codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 320, 1)))
    s2a_params = {
        "params": {**s2a_params["params"], "codec": codec_params["params"]}
    }
    t2s_params = jax.jit(
        lambda r: t2s.init(
            r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
            jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
            jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
        )
    )(rng)
    return t2s, s2a, t2s_params, s2a_params


def make_hoststep(t2s, s2a, t2s_params, s2a_params):
    """Pre-compiled per-iteration programs mirroring the fused scan bodies.

    Returns ``run(text_tokens, text_lengths, prompt_ac, prompt_sem, rng,
    sync) -> (semantic_tokens, codes, audio_np)``; ``sync=True`` pulls a
    4-byte scalar after every iteration (the reference's host-stepped shape),
    ``sync=False`` queues the same programs back-to-back.
    """
    offset = t2s.cfg.semantic_offset

    # ---- t2s per-iteration programs (mirror t2s/sampler.py body) ----
    # params are explicit jit ARGUMENTS (not closures): closed-over arrays
    # are baked into the HLO as literal constants, and the 464M s2a blob
    # overflows the remote-compile request (HTTP 413) — and would bloat
    # every per-iteration executable.
    @jax.jit
    def t2s_step(t2s_p, tokens, mask, canvas, attention, speech_span,
                 init_num, ratio, key):
        def logits_fn(tk):
            emb = t2s.apply(t2s_p, tk, method=TextToSemantic.embed)
            return t2s.apply(
                t2s_p, emb, attention, conv_pad_mask=attention,
                method=TextToSemantic.embeddings_to_logits,
            )

        k_sample, k_mask = jax.random.split(key)
        logits = logits_fn(tokens)
        sampled = jax.random.categorical(k_sample, logits, axis=-1)
        mask_len = jnp.floor(init_num * ratio)
        mask_len = jnp.maximum(1.0, jnp.minimum(mask_len, init_num))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        selected = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        selected = jnp.where(mask, selected, jnp.inf)
        next_mask = random_topk_mask(
            k_mask, mask_len, selected, temperature=1.0 * ratio
        )
        new_tokens = jnp.where(next_mask, SPECIAL_TOKENS["mask"], sampled + offset)
        tokens = jnp.where(speech_span, new_tokens, canvas)
        return tokens, next_mask

    @jax.jit
    def t2s_final(t2s_p, tokens, attention, text_lengths, lengths):
        emb = t2s.apply(t2s_p, tokens, method=TextToSemantic.embed)
        logits = t2s.apply(
            t2s_p, emb, attention, conv_pad_mask=attention,
            method=TextToSemantic.embeddings_to_logits,
        )
        final = jnp.argmax(logits, axis=-1)
        span_pos = 3 + text_lengths[:, None] + jnp.arange(T_GEN)[None, :]
        tokens = jnp.take_along_axis(
            final, jnp.clip(span_pos, 0, final.shape[1] - 1), axis=1
        )
        valid = jnp.arange(T_GEN)[None, :] < lengths[:, None]
        return jnp.where(valid, tokens, 0).astype(jnp.int32)

    # ---- s2a per-iteration programs (mirror s2a/sampler.py body, full
    # canvas: semantic_valid=None like the fused assume_full_canvas path) ----
    n_inj_layers = len(s2a.cfg.injection_layers)

    @jax.jit
    def s2a_prep(s2a_p, semantic_tokens, prompt_ac, prompt_sem):
        apply = functools.partial(s2a.apply, s2a_p)
        b, t = semantic_tokens.shape
        sem = apply(semantic_tokens, method=InjectionConformer.embed_semantic)
        mask_tok = apply(method=InjectionConformer.mask_token_value)
        sem_p = apply(prompt_sem, method=InjectionConformer.embed_semantic)
        ac_p = apply(prompt_ac, method=InjectionConformer.acoustic_features_unreduced)
        ac_p0 = apply(ac_p[:, 0], method=InjectionConformer.project_acoustic)
        enc_prompt = sem_p + ac_p0
        n_inj = min(n_inj_layers, prompt_ac.shape[1])
        cum = jnp.cumsum(ac_p, axis=1)
        zeros_pad = jnp.zeros((b, t, ac_p.shape[-1]), dtype=ac_p.dtype)
        prompt_injections = jnp.stack(
            [jnp.concatenate([cum[:, i], zeros_pad], axis=1) for i in range(n_inj)],
            axis=0,
        )
        tp = prompt_ac.shape[-1]
        mask_time = jnp.concatenate(
            [jnp.zeros((b, tp), bool), jnp.ones((b, t), bool)], axis=1
        )
        return sem, mask_tok, enc_prompt, prompt_injections, mask_time

    def first_level(apply, enc_gen, enc_prompt):
        full = jnp.concatenate([enc_prompt, enc_gen], axis=1)
        logits = apply(full, None, method=InjectionConformer.forward_first_level)
        return logits[:, T_PROMPT:]

    @jax.jit
    def s2a_step(s2a_p, enc_gen, mask, sem, mask_tok, enc_prompt, ratio, key):
        apply = functools.partial(s2a.apply, s2a_p)
        b, t = mask.shape
        k_sample, k_mask = jax.random.split(key)
        logits = first_level(apply, enc_gen, enc_prompt)
        sampled = positional_categorical(k_sample, logits)
        feats = apply(sampled[:, None, :], method=InjectionConformer.acoustic_features)
        proj = apply(feats, method=InjectionConformer.project_acoustic)
        enc_gen = jnp.where(mask[:, :, None], sem + proj, enc_gen)
        init_num = jnp.full((b,), t, dtype=jnp.float32)
        mask_len = jnp.floor(init_num * ratio)
        mask_len = jnp.maximum(
            jnp.ones_like(mask_len),
            jnp.minimum(jnp.sum(mask, axis=-1) - 1.0, mask_len),
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        selected = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        selected = jnp.where(mask, selected, jnp.inf)
        next_mask = random_topk_mask(
            k_mask, mask_len, selected, temperature=1.0 * ratio,
            gumbel=positional_gumbel(k_mask, b, t),
        )
        enc_gen = jnp.where(next_mask[:, :, None], sem + mask_tok, enc_gen)
        return enc_gen, next_mask

    @jax.jit
    def s2a_final(s2a_p, enc_gen, mask, sem, enc_prompt, prompt_injections,
                  mask_time):
        apply = functools.partial(s2a.apply, s2a_p)
        logits = first_level(apply, enc_gen, enc_prompt)
        ids = jnp.argmax(logits, axis=-1)
        feats = apply(ids[:, None, :], method=InjectionConformer.acoustic_features)
        proj = apply(feats, method=InjectionConformer.project_acoustic)
        enc_gen = jnp.where(mask[:, :, None], sem + proj, enc_gen)
        full = jnp.concatenate([enc_prompt, enc_gen], axis=1)
        all_logits = apply(
            full, prompt_injections=prompt_injections, mask_time=mask_time,
            pad_mask=None, generated_start=T_PROMPT,
            method=InjectionConformer.forward_logits,
        )
        return jnp.argmax(all_logits, axis=-1)

    @jax.jit
    def decode(s2a_p, codes):
        return s2a.apply(s2a_p, codes, method=InjectionConformer.decode_audio)

    canvas_build = jax.jit(functools.partial(build_canvas, max_speech_len=T_GEN))
    ratios_t2s = sampling_mask_ratios(PRED_ITERS)
    ratios_s2a = sampling_mask_ratios(STEPS)

    def run(text_tokens, text_lengths, prompt_ac, prompt_sem, rng, sync,
            sync_times=None):
        """``sync_times`` (optional list) collects the wall time of every
        per-iteration host pull — each pull blocks on the just-queued
        program's compute PLUS the host<->device (tunnel) roundtrip, so the
        per-sync breakdown separates orchestration cost from compute."""

        def pull(x):
            if sync_times is None:
                return np.asarray(x)
            t0 = time.perf_counter()
            v = np.asarray(x)
            sync_times.append(time.perf_counter() - t0)
            return v

        b = text_tokens.shape[0]
        k_t2s, k_s2a = jax.random.split(rng)  # same split as e2e_synthesize
        lengths = jnp.full((b,), T_GEN, jnp.int32)
        canvas, attention, speech_span = canvas_build(
            text_tokens, text_lengths, lengths
        )
        init_num = lengths.astype(jnp.float32)
        tokens, mask = canvas, speech_span
        keys = jax.random.split(k_t2s, PRED_ITERS - 1)
        for i in range(PRED_ITERS - 1):
            tokens, mask = t2s_step(
                t2s_params, tokens, mask, canvas, attention, speech_span,
                init_num, ratios_t2s[i], keys[i],
            )
            if sync:
                _ = pull(tokens[0, :1])  # 4-byte scalar pull per iter
        semantic = t2s_final(t2s_params, tokens, attention, text_lengths, lengths)
        if sync:
            # stage hop through the host: the reference's boolean-mask span
            # extraction (modeling_text_to_semantic.py:267) is a dynamic-
            # shape op = device->host sync before s2a consumes the tokens
            semantic = jnp.asarray(pull(semantic))

        sem, mask_tok, enc_prompt, prompt_injections, mask_time = s2a_prep(
            s2a_params, semantic, prompt_ac, prompt_sem
        )
        if sync:
            _ = pull(mask_tok[:1])
        enc_gen = sem + mask_tok  # tiny eager add, matches sampler init
        s_mask = jnp.ones((b, T_GEN), bool)
        keys = jax.random.split(k_s2a, STEPS - 1)
        for i in range(STEPS - 1):
            enc_gen, s_mask = s2a_step(
                s2a_params, enc_gen, s_mask, sem, mask_tok, enc_prompt,
                ratios_s2a[i], keys[i],
            )
            if sync:
                _ = pull(enc_gen[0, :1, 0])
        codes = s2a_final(
            s2a_params, enc_gen, s_mask, sem, enc_prompt, prompt_injections,
            mask_time
        )
        if sync:
            codes = jnp.asarray(pull(codes))  # host hop to the codec
        audio = decode(s2a_params, codes)
        audio_np = np.asarray(audio)  # the reference's final .cpu() pull
        return semantic, codes, audio_np

    return run


def main():
    rng = jax.random.PRNGKey(0)
    t2s, s2a, t2s_params, s2a_params = build_models(rng)

    text_tokens = jax.random.randint(rng, (1, TEXT_LEN), 5, 261)
    text_lengths = jnp.asarray([TEXT_LEN], jnp.int32)
    prompt_ac = jax.random.randint(rng, (1, 12, T_PROMPT), 0, 1024)
    prompt_sem = jax.random.randint(rng, (1, T_PROMPT), 0, 1024)
    gt_length = jnp.asarray([T_GEN], jnp.int32)
    run_key = jax.random.PRNGKey(7)

    def fused(key):
        return e2e_synthesize(
            t2s, s2a, t2s_params, s2a_params, text_tokens, text_lengths,
            prompt_ac, prompt_sem, key,
            pred_iters=PRED_ITERS, steps=STEPS, max_speech_len=T_GEN,
            gt_length=gt_length, assume_full_canvas=True,
        )

    hoststep = make_hoststep(t2s, s2a, t2s_params, s2a_params)

    # --- correctness: equal work. The step programs are the same math with
    # the same PRNG key schedule as the fused scan bodies; outputs are NOT
    # bit-identical because separate XLA programs fuse/round bf16 slightly
    # differently than the fused scan, and near-tie categorical draws then
    # diverge (trajectory chaos — same effect as bf16-vs-f32, see
    # tests/test_quant_accuracy.py docstring). Compute per-program timing is
    # data-independent (static shapes), so the comparison is unaffected;
    # agreement is reported for transparency.
    out_f = fused(run_key)
    sem_f = np.asarray(out_f["semantic_tokens"])
    codes_f = np.asarray(out_f["acoustic_codes"])
    sem_h, codes_h, audio_h = hoststep(
        text_tokens, text_lengths, prompt_ac, prompt_sem, run_key, sync=True
    )
    sem_h, codes_h = np.asarray(sem_h), np.asarray(codes_h)
    assert sem_h.shape == sem_f.shape and codes_h.shape == codes_f.shape
    print(
        f"token agreement (info only, random weights): "
        f"semantic {float((sem_f == sem_h).mean()):.3f}, "
        f"acoustic {float((codes_f == codes_h).mean()):.3f}",
        file=sys.stderr,
    )

    def med(times):
        return float(np.median(times))

    n = 10
    # host-stepped (reference shape): per-run wall, syncs serialize anyway
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        hoststep(text_tokens, text_lengths, prompt_ac, prompt_sem,
                 jax.random.PRNGKey(100 + i), sync=True)
        ts.append(time.perf_counter() - t0)
    t_host = med(ts)

    # queued unfused: same programs, no intermediate syncs
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        hoststep(text_tokens, text_lengths, prompt_ac, prompt_sem,
                 jax.random.PRNGKey(100 + i), sync=False)
        ts.append(time.perf_counter() - t0)
    t_queued = med(ts)

    # fused: same per-run protocol (one dispatch + final audio pull)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(fused(jax.random.PRNGKey(100 + i))["audio"])
        ts.append(time.perf_counter() - t0)
    t_fused = med(ts)

    # --- per-sync breakdown (VERDICT r4 item 5): each host-stepped sync
    # blocks on (a) the just-queued program's compute and (b) one
    # host<->device roundtrip through the axon tunnel. Separate them:
    # measure every individual pull, and measure a null roundtrip (trivial
    # program + 4-byte pull) in the SAME session so tunnel congestion is
    # held constant across the comparison.
    sync_times: list[float] = []
    for i in range(3):
        hoststep(text_tokens, text_lengths, prompt_ac, prompt_sem,
                 jax.random.PRNGKey(200 + i), sync=True,
                 sync_times=sync_times)
    n_syncs = len(sync_times) // 3

    null_prog = jax.jit(lambda x: x + 1)
    one = jnp.ones((), jnp.float32)
    _ = np.asarray(null_prog(one))  # compile
    null_ts = []
    for _i in range(50):
        t0 = time.perf_counter()
        _ = np.asarray(null_prog(one))
        null_ts.append(time.perf_counter() - t0)
    t_null = med(null_ts)

    # tunnel-independent model of the host-stepped cost: the queued run
    # already contains all compute + program-launch overhead; a host-stepped
    # run adds one roundtrip per sync on top (lower bound — real per-sync
    # waits also serialize compute that queuing overlaps).
    t_host_model = t_queued + n_syncs * t_null

    for name, t in [("hoststep", t_host), ("queued_unfused", t_queued),
                    ("fused", t_fused)]:
        print(json.dumps({
            "metric": f"e2e_10s_{name}_ms", "value": round(t * 1e3, 2),
            "unit": "ms_per_utterance",
        }))
    print(json.dumps({
        "metric": "hoststep_over_fused", "value": round(t_host / t_fused, 2),
        "unit": "x", "note": "reference execution shape vs fused scan, "
        "equal weights/NFE/shapes/key schedule; environment-measured "
        "(includes axon tunnel sync latency)",
    }))
    print(json.dumps({
        "metric": "queued_over_fused", "value": round(t_queued / t_fused, 2),
        "unit": "x", "note": "program-count overhead only; "
        "tunnel/sync-independent, chip-intrinsic",
    }))
    print(json.dumps({
        "metric": "per_sync_breakdown", "n_syncs": n_syncs,
        "per_sync_ms": {
            "p50": round(float(np.median(sync_times)) * 1e3, 2),
            "p10": round(float(np.percentile(sync_times, 10)) * 1e3, 2),
            "p90": round(float(np.percentile(sync_times, 90)) * 1e3, 2),
        },
        "null_roundtrip_ms": {
            "p50": round(t_null * 1e3, 2),
            "p10": round(float(np.percentile(null_ts, 10)) * 1e3, 2),
            "p90": round(float(np.percentile(null_ts, 90)) * 1e3, 2),
        },
        "unit": "ms",
    }))
    print(json.dumps({
        "metric": "hoststep_over_fused_modeled",
        "value": round(t_host_model / t_fused, 2), "unit": "x",
        "note": "tunnel-held-constant model: queued + n_syncs * "
        "null_roundtrip (lower bound on host-stepped cost); the gap "
        "between this and the measured ratio is sync-serialization + "
        "tunnel variance",
    }))


if __name__ == "__main__":
    main()
