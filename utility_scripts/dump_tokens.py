"""Distributed offline tokenization: dump aligned acoustic+semantic token
shards for LibriLight / LibriHeavy.

The sharded-TPU-batch-job re-design of the reference's multi-GPU dump
(/root/reference/utility_scripts/dump_tokens/dump_tokens.py): the manifest
is sharded per process (``manifest[process_index::process_count]``, the
accelerate ``dispatch_batches=False`` analog), each host collates padded
batches (pad hack + loudness normalize), runs the jitted codec+HuBERT
encode on its chips, trims to per-item code lengths, and writes
``shard_{rank}_{idx}`` files (~1000 items each).

Usage:
  python utility_scripts/dump_tokens.py --dataset librilight --data_dir ... \
      --subset small --output_dir data/codes --codec_model ... --hubert_model ...
"""

from __future__ import annotations

import argparse
import os
import sys

# runnable as a bare CLI from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import numpy as np


def main():
    from edm_tts_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # EDM_PLATFORM=cpu overrides the axon plugin
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["librilight", "libriheavy", "librispeech"],
                    required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--subset", default="small")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--codec_model", required=True)
    ap.add_argument("--hubert_model", required=True)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--segment_seconds", type=float, default=60.0,
                    help="librilight window size (reference: 60 s)")
    ap.add_argument("--items_per_shard", type=int, default=1000)
    ap.add_argument("--max_items", type=int, default=-1)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--prefetch_threads", type=int, default=2,
                    help="native C++ audio-decode threads running ahead of "
                         "the device (0 = synchronous loads); the "
                         "DataLoader-worker analog of the reference's "
                         "num_workers=32 (dump_tokens.py:176-179)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from edm_tts_tpu.data.collators import collate_dump_batch
    from edm_tts_tpu.data.manifests import (
        libriheavy_manifest,
        librilight_manifest,
        librispeech_manifest,
    )
    from edm_tts_tpu.data.pipeline import shard_for_process
    from edm_tts_tpu.data.token_shards import TokenShardWriter
    from edm_tts_tpu.utils.hub import build_audio_tokenizer
    from edm_tts_tpu.utils.logging import setup_logging

    setup_logging()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    tokenizer, codec_params, sem_params = build_audio_tokenizer(
        args.codec_model, args.hubert_model, dtype=dtype
    )

    if args.dataset == "librilight":
        manifest = librilight_manifest(args.data_dir, args.subset,
                                       segment_seconds=args.segment_seconds)
    elif args.dataset == "libriheavy":
        manifest = libriheavy_manifest(args.data_dir, args.subset)
    else:
        manifest = librispeech_manifest(args.data_dir, args.subset)

    rank, world = jax.process_index(), jax.process_count()
    writer = TokenShardWriter(args.output_dir, rank, args.items_per_shard)

    stream = shard_for_process(manifest, rank, world)
    if args.prefetch_threads > 0:
        from edm_tts_tpu.data.native_prefetch import prefetch_manifest

        stream = prefetch_manifest(stream, n_threads=args.prefetch_threads)

    buf = []
    n_done = 0
    t0 = time.time()
    for window in stream:
        buf.append(window)
        if len(buf) < args.batch_size:
            continue
        n_done += _process(buf, tokenizer, codec_params, sem_params, writer,
                           collate_dump_batch)
        buf = []
        if n_done and n_done % 100 == 0:
            rate = n_done / (time.time() - t0)
            print(f"[rank {rank}] {n_done} items ({rate:.1f}/s)")
        if 0 < args.max_items <= n_done:
            break
    if buf:
        n_done += _process(buf, tokenizer, codec_params, sem_params, writer,
                           collate_dump_batch)
    writer.close()
    print(f"[rank {rank}] done: {n_done} items in {time.time() - t0:.0f}s")


def _process(windows, tokenizer, codec_params, sem_params, writer, collate):
    batch = collate(windows, tokenizer)
    out = tokenizer.compute_codes_batch(
        codec_params,
        sem_params,
        batch["normalized_audio"],
        batch["padded_audio"],
        batch["attention_mask"],
    )
    acoustic = np.asarray(out["acoustic_codes"])
    semantic = np.asarray(out["semantic_codes"])
    for i, item_id in enumerate(batch["ids"]):
        n = int(batch["code_lengths"][i])
        writer.add(
            item_id,
            acoustic[i, :, :n].astype(np.int16),
            semantic[i, :n].astype(np.int16),
            text=batch["transcriptions"][i],
            text_bytes=batch["transcription_bytes"][i],
            no_punc_text=batch["no_punc_transcriptions"][i],
            no_punc_text_bytes=batch["no_punc_transcription_bytes"][i],
        )
    return len(batch["ids"])


if __name__ == "__main__":
    main()
