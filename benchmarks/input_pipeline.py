"""Host input-pipeline throughput: can the 1-core host FEED the chip?

VERDICT r4 #3 (missing evidence): the GAN long run consumed pre-staged
batches; nothing showed the real pipeline — FLAC decode (native/flac.cc on
the C++ pool) -> segment -> silence filter -> loudness normalize -> collate
(data/pipeline.py) — sustaining the training consumption rate. The
reference feeds this stage with 32 torch DataLoader workers
(/root/reference/run_codec_training.py:216-252 + configs/dac/
train_config.yaml dataloader_num_workers); our analog is the C++ decode
pool (``dataloader_num_workers`` -> ``prefetch_threads``).

Measures, on a synthetic 16 kHz FLAC corpus (LibriSpeech-like harmonic
content, fixed-order-2 frames like real encoders emit):

  1. bare decode rate (prefetch_audio_windows), 1 and 4 threads
  2. the FULL codec training feed at the recipe shape (B32 x 0.38 s),
     sync decode vs prefetch_threads=4
  3. headroom vs the measured GAN consumption rate (12.16 audio-s per
     136 ms step = 89.6 audio-s/s, benchmarks/README.md)

CPU-only (no chip): EDM_PLATFORM=cpu python benchmarks/input_pipeline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

from benchmarks.common import report

SR = 16000
N_FILES = 24
FILE_SECONDS = 30.0
BATCH = 32
SEG = 0.38
GAN_CONSUME = BATCH * SEG / 0.136  # audio-s/s at the measured 136 ms/step


def make_corpus(root: str) -> list[dict]:
    from flac_encoder import encode_flac

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    t = np.arange(int(FILE_SECONDS * SR)) / SR
    manifest = []
    for i in range(N_FILES):
        path = os.path.join(root, f"{i:04d}.flac")
        if not os.path.exists(path):
            f0 = rng.uniform(90, 300)
            sig = np.zeros_like(t)
            for h in range(1, 6):
                sig += (0.4 / h) * np.sin(
                    2 * np.pi * h * f0 * t + rng.uniform(0, 2 * np.pi))
            sig *= 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(1.5, 5) * t)
            sig += 0.01 * rng.standard_normal(t.shape)
            sig = 0.7 * sig / np.abs(sig).max()
            ints = np.clip(sig * 32767, -32768, 32767).astype(np.int64)
            with open(path, "wb") as f:
                f.write(encode_flac(ints[None], sample_rate=SR,
                                    subframe_kind="fixed", order=2, param=12))
        manifest.append({"id": f"{i:04d}", "file": path})
    return manifest


def bench_decode(manifest, n_threads):
    from edm_tts_tpu.data.native_prefetch import prefetch_audio_windows

    windows = [(m["file"], 0, -1) for m in manifest]
    t0 = time.perf_counter()
    total = 0.0
    for audio, sr in prefetch_audio_windows(windows, n_threads=n_threads):
        total += audio.shape[-1] / sr
    return total / (time.perf_counter() - t0)


def bench_feed(manifest, prefetch_threads, n_batches=50):
    from edm_tts_tpu.data.collators import collate_codec_audio
    from edm_tts_tpu.data.pipeline import batched, codec_audio_pipeline

    it = batched(
        codec_audio_pipeline(
            manifest, target_sr=SR, segment_seconds=SEG,
            shuffle=len(manifest), seed=0,
            prefetch_threads=prefetch_threads,
        ),
        BATCH, stack=collate_codec_audio,
    )
    next(it)  # warm (first file decode + shuffle fill)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = next(it)
    dt = time.perf_counter() - t0
    assert b.shape == (BATCH, int(SEG * SR), 1), b.shape
    return n_batches * BATCH * SEG / dt


def main():
    manifest = make_corpus("/tmp/input_pipeline_corpus")

    dec1 = bench_decode(manifest, 1)
    dec4 = bench_decode(manifest, 4)
    report("flac_decode_1thread", dec1, "audio-s/s")
    report("flac_decode_4thread", dec4, "audio-s/s")

    sync = bench_feed(manifest, 0)
    pre = bench_feed(manifest, 4)
    report("train_feed_sync", sync, "audio-s/s")
    report("train_feed_prefetch4", pre, "audio-s/s")
    report("feed_headroom_vs_gan_step", pre / GAN_CONSUME, "x",)
    print(f"# GAN consumption at 136 ms/step: {GAN_CONSUME:.1f} audio-s/s; "
          f"feed must exceed it to avoid starvation")


if __name__ == "__main__":
    main()
