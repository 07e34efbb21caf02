"""End-to-end zero-shot TTS inference: text + speaker prompt wav -> wav.

Same CLI surface as the reference (/root/reference/inference.py): tokenize
the speaker prompt (aligned acoustic+semantic codes), run the t2s MaskGIT
sampler (16 iters), the s2a sampler (8 level-0 steps + one full injection
pass), decode with the codec, save 16 kHz wav. The three device stages are
jitted lax.scan programs (bf16 by default on TPU).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


from edm_tts_tpu.utils.bucketing import bucket_length  # re-export (CLI API)


def main():
    from edm_tts_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # EDM_PLATFORM=cpu overrides the axon plugin
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--speaker_prompt", required=True)
    ap.add_argument("-t", "--text", default=None)
    ap.add_argument("--text_file", default=None,
                    help="batch mode: one utterance per line -> "
                         "<output stem>_<i>.wav")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--codec_model", default="exp/edm_tts/dac/best_model")
    ap.add_argument("--t2s_model", default="exp/edm_tts/text_to_semantic_w_length/")
    ap.add_argument("--s2a_model", default="exp/edm_tts/injection_conformer/")
    ap.add_argument("--hubert_model", default="exp/edm_tts/hubert_semantic")
    ap.add_argument("--pred_iters", type=int, default=16)
    ap.add_argument("--s2a_steps", type=int, default=8)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--max_speech_len", type=int, default=1250)
    ap.add_argument("--length_bucket", type=int, default=64,
                    help="staged mode: round the s2a canvas up to this "
                         "multiple so lengths in one bucket share a "
                         "compiled program")
    ap.add_argument("--gt_length", type=int, default=None,
                    help="override the predicted speech length (tokens)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--quantize", default="none",
                    choices=["none", "int8", "w8a8"],
                    help="int8 t2s/s2a matmuls: 'int8' = weight-only "
                         "(in-VMEM dequant Pallas kernel, halves weight "
                         "memory), 'w8a8' = dynamic activation quant + "
                         "native s8xs8 MXU dot (measured -25%% on the "
                         "batch-1 s2a stage; see benchmarks/README.md)")
    ap.add_argument("--quantize_t2s", default=None,
                    choices=["none", "int8", "w8a8"],
                    help="per-stage override of --quantize for t2s "
                         "(measured best: t2s stays bf16)")
    ap.add_argument("--quantize_s2a", default=None,
                    choices=["none", "int8", "w8a8"],
                    help="per-stage override of --quantize for s2a "
                         "(measured best at batch 1: w8a8)")
    ap.add_argument("--long", action="store_true",
                    help="long-form mode: chunk --text at sentence "
                         "boundaries sized to the t2s canvas, synthesize "
                         "the chunks as ONE batch, and join the waveforms "
                         "into a single output file (the canvas bounds a "
                         "single utterance to ~25 s at full size)")
    ap.add_argument("--max_chunk_chars", type=int, default=None,
                    help="--long chunk budget (default: derived from "
                         "--max_speech_len; 1250 -> 300 chars)")
    ap.add_argument("--long_batch", type=int, default=16,
                    help="--long synthesizes chunks in groups of at most "
                         "this many (matches the engine's largest batch "
                         "bucket); an uncapped batch of a genuinely long "
                         "document would OOM the s2a on a full canvas")
    ap.add_argument("--crossfade_ms", type=float, default=30.0,
                    help="--long chunk-join crossfade")
    ap.add_argument("--gap_ms", type=float, default=0.0,
                    help="--long inter-chunk silence (disables crossfade)")
    ap.add_argument("--one_shot", action="store_true",
                    help="fuse t2s->s2a->decode into ONE jitted device "
                         "program on a fixed max_speech_len canvas (no host "
                         "sync between stages; best when utterances fill the "
                         "canvas or dispatch latency dominates)")
    args = ap.parse_args()

    from edm_tts_tpu.data.audio_io import load_audio, save_wav
    from edm_tts_tpu.models.s2a import s2a_sample
    from edm_tts_tpu.models.t2s import t2s_sample
    from edm_tts_tpu.ops.resample import resample_numpy
    from edm_tts_tpu.utils.hub import build_audio_tokenizer, load_s2a, load_t2s

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    tokenizer, codec_params, sem_params = build_audio_tokenizer(
        args.codec_model, args.hubert_model, dtype=dtype
    )
    s2a_model, s2a_params = load_s2a(
        args.s2a_model, dtype=dtype,
        quantize=args.quantize_s2a or args.quantize,
    )
    t2s_model, t2s_params = load_t2s(
        args.t2s_model, dtype=dtype,
        quantize=args.quantize_t2s or args.quantize,
    )

    # 1. tokenize the speaker prompt
    audio, sr = load_audio(args.speaker_prompt)
    wav = audio[0]
    if sr != tokenizer.sample_rate:
        wav = resample_numpy(wav, sr, tokenizer.sample_rate)
    prompt = tokenizer.compute_codes(codec_params, sem_params, wav[None])
    prompt_acoustic = prompt["acoustic_codes"]  # (1, Q, Tp)
    prompt_semantic = prompt["semantic_codes"]  # (1, Tp)

    # 2. collect utterances (single, batch, or long-form chunked mode)
    if args.long:
        if args.text is None or args.text_file:
            ap.error("--long takes --text (not --text_file)")
        if args.gt_length is not None:
            ap.error("--gt_length is per-utterance; incompatible with --long")
        from edm_tts_tpu.serving.chunking import default_chunk_chars, split_text

        texts = split_text(
            args.text,
            args.max_chunk_chars or default_chunk_chars(args.max_speech_len),
        )
        print(f"long-form: {len(texts)} chunks")
    elif args.text_file:
        with open(args.text_file) as f:
            texts = [l.strip() for l in f if l.strip()]
    elif args.text is not None:
        texts = [args.text]
    else:
        ap.error("one of --text / --text_file is required")

    rng = jax.random.PRNGKey(args.seed)
    ds = tokenizer.downsample_factor

    def synthesize_group(
        texts_group: list[str], group_idx: int
    ) -> list[np.ndarray]:
        """Run the staged (or fused) pipeline on one batch of utterances;
        returns per-utterance waveforms trimmed to their predicted lengths.

        Buckets the text length to a multiple of 32 so groups with similar
        texts reuse the jitted sampler (static-shape canvas). The group
        index is folded into the PRNG so every group of --long_batch chunks
        draws a fresh sampling stream (ADVICE r4: reusing one key repeated
        the identical noise every long_batch chunks across a document)."""
        g_rng = jax.random.fold_in(rng, group_idx)
        k_t2s, k_s2a = jax.random.split(g_rng)
        b = len(texts_group)
        byte_seqs = [[c + 5 for c in t.encode("utf-8")] for t in texts_group]
        lt = -(-max(len(s) for s in byte_seqs) // 32) * 32
        text_tokens = jnp.asarray(
            [s + [0] * (lt - len(s)) for s in byte_seqs], jnp.int32
        )
        text_lengths = jnp.asarray([len(s) for s in byte_seqs], jnp.int32)
        gt = None
        if args.gt_length is not None:
            gt = jnp.full((b,), args.gt_length, jnp.int32)

        if args.one_shot:
            # single fused dispatch: t2s -> s2a -> decode in one XLA program
            from edm_tts_tpu.pipeline import e2e_synthesize

            out = e2e_synthesize(
                t2s_model, s2a_model, t2s_params, s2a_params,
                text_tokens, text_lengths, prompt_acoustic, prompt_semantic,
                g_rng,
                pred_iters=args.pred_iters, steps=args.s2a_steps,
                temperature=args.temperature,
                max_speech_len=args.max_speech_len,
                gt_length=gt,
            )
            audio_out = np.asarray(out["audio"], dtype=np.float32)
            lengths = np.asarray(out["lengths"])
        else:
            # 3. text -> semantic tokens (batched MaskGIT)
            t2s_out = t2s_sample(
                t2s_model, t2s_params, text_tokens, text_lengths, k_t2s,
                pred_iters=args.pred_iters, temperature=args.temperature,
                max_speech_len=args.max_speech_len, gt_length=gt,
            )
            lengths = np.asarray(t2s_out["lengths"])
            # bucket the canvas length so each new utterance length within a
            # bucket reuses ONE compiled s2a/decode program (semantic_valid /
            # valid_frames make valid positions bit-identical to an
            # exact-size canvas); unbucketed, every distinct length re-jits
            # the 464M s2a scan
            n_max = bucket_length(int(lengths.max()), args.length_bucket,
                                  args.max_speech_len)
            semantic_tokens = t2s_out["semantic_tokens"][:, :n_max]
            lengths_dev = jnp.asarray(lengths, jnp.int32)
            semantic_valid = jnp.arange(n_max)[None, :] < lengths_dev[:, None]

            # 4. semantic -> acoustic codes (zero-shot, prompt broadcast)
            acoustic_codes = s2a_sample(
                s2a_model, s2a_params, semantic_tokens,
                jnp.broadcast_to(
                    prompt_acoustic, (b, *prompt_acoustic.shape[1:])
                ),
                jnp.broadcast_to(
                    prompt_semantic, (b, *prompt_semantic.shape[1:])
                ),
                k_s2a, steps=args.s2a_steps, temperature=args.temperature,
                semantic_valid=semantic_valid,
            )

            # 5. decode to waveforms (per-sample masked: valid audio
            # identical to decoding each utterance at its exact length)
            decode = jax.jit(lambda p, c, vf: tokenizer.codec.apply(
                p, c, vf, method="decode_from_codes"
            ))
            audio_out = np.asarray(
                decode(codec_params, acoustic_codes, lengths_dev),
                dtype=np.float32,
            )
        return [audio_out[i, : int(lengths[i]) * ds, 0] for i in range(b)]

    # --long slices the chunk list into groups of at most --long_batch
    # (matching TTSEngine.synthesize_long): one unbounded batch over a long
    # document would OOM the s2a on a full-size canvas and would compile a
    # fresh XLA program for every distinct chunk count
    cap = max(1, args.long_batch) if args.long else len(texts)
    waves: list[np.ndarray] = []
    for gi, g in enumerate(range(0, len(texts), cap)):
        waves.extend(synthesize_group(texts[g : g + cap], gi))

    if args.long:
        # join the chunk waveforms into ONE long-form output
        from edm_tts_tpu.serving.chunking import join_waveforms

        joined = join_waveforms(
            waves, tokenizer.sample_rate,
            crossfade_ms=args.crossfade_ms, gap_ms=args.gap_ms,
        )
        save_wav(args.output, joined, tokenizer.sample_rate)
        print(f"wrote {args.output}: "
              f"{joined.shape[0] / tokenizer.sample_rate:.2f}s "
              f"({len(texts)} chunks)")
        return
    stem, ext = (args.output.rsplit(".", 1) + ["wav"])[:2]
    for i, wav_i in enumerate(waves):
        n = wav_i.shape[0]
        out_path = args.output if len(waves) == 1 else f"{stem}_{i}.{ext}"
        save_wav(out_path, wav_i, tokenizer.sample_rate)
        print(f"wrote {out_path}: {n / tokenizer.sample_rate:.2f}s")


if __name__ == "__main__":
    main()
