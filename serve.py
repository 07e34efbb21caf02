"""Serve zero-shot TTS over HTTP: model dirs -> REST endpoint.

The deployment counterpart of inference.py (the reference stops at a
hand-run script, /root/reference/inference.py): loads the three stages
once, optionally registers speaker prompts from wav/flac files, and serves
/synthesize (WAV), /speakers, /healthz and /stats with dynamic request
batching (see edm_tts_tpu/serving/). Long-form requests (`"long": true`)
are chunked at sentence boundaries and ride the same batched dispatches.
SIGTERM shuts down gracefully.

    python serve.py --codec_model ... --t2s_model ... --s2a_model ... \
        --hubert_model ... --speaker alice=alice.flac --port 8000
"""

from __future__ import annotations

import argparse
import signal


def build_server(args):
    import jax.numpy as jnp

    from edm_tts_tpu.data.audio_io import load_audio
    from edm_tts_tpu.serving import TTSEngine, TTSServer

    engine = TTSEngine(
        args.codec_model, args.t2s_model, args.s2a_model, args.hubert_model,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        quantize=args.quantize,
        quantize_t2s=args.quantize_t2s,
        quantize_s2a=args.quantize_s2a,
        pred_iters=args.pred_iters,
        s2a_steps=args.s2a_steps,
        temperature=args.temperature,
        max_speech_len=args.max_speech_len,
    )
    for spec in args.speaker or []:
        name, path = spec.split("=", 1)
        audio, sr = load_audio(path)
        engine.register_speaker(name, audio[0], sr)
    return TTSServer(
        engine, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        lookahead=args.batch_lookahead,
    )


def main():
    from edm_tts_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # EDM_PLATFORM=cpu overrides the axon plugin
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec_model", default="exp/edm_tts/dac/best_model")
    ap.add_argument("--t2s_model",
                    default="exp/edm_tts/text_to_semantic_w_length/")
    ap.add_argument("--s2a_model", default="exp/edm_tts/injection_conformer/")
    ap.add_argument("--hubert_model", default="exp/edm_tts/hubert_semantic")
    ap.add_argument("--speaker", action="append", metavar="NAME=WAV",
                    help="register a speaker prompt at startup (repeatable);"
                         " more can be added at runtime via POST /speakers")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=25.0)
    # length-aware batch formation: drain up to max_batch*lookahead queued
    # requests, sort by estimated length, cut homogeneous chunks (1.29x on
    # a realistic duration mix, scripts/profile_lengthmix.py); 1 = off
    ap.add_argument("--batch_lookahead", type=int, default=4)
    ap.add_argument("--pred_iters", type=int, default=16)
    ap.add_argument("--s2a_steps", type=int, default=8)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--max_speech_len", type=int, default=1250)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--quantize", default="none",
                    choices=["none", "int8", "w8a8"],
                    help="int8 t2s/s2a matmuls for serving ('int8' = "
                         "weight-only halved weight memory, 'w8a8' = native "
                         "s8xs8 MXU dot, -25%% on the batch-1 s2a stage)")
    ap.add_argument("--quantize_t2s", default=None,
                    choices=["none", "int8", "w8a8"],
                    help="per-stage override (measured best: t2s bf16)")
    ap.add_argument("--quantize_s2a", default=None,
                    choices=["none", "int8", "w8a8"],
                    help="per-stage override (measured best at batch 1: w8a8)")
    args = ap.parse_args()

    server = build_server(args)
    signal.signal(signal.SIGTERM, lambda *_: server.shutdown())
    print(f"serving on http://{server.host}:{server.port} "
          f"(speakers: {server.engine.speakers()})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
