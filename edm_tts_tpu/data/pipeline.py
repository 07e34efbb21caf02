"""Streaming host-side input pipeline: shuffle buffer, segmenting, filters,
fixed-shape batching, process sharding.

Replaces the reference's HF ``datasets`` iterable pipeline
(run_codec_training.py:216-252: to_iterable_dataset -> shuffle(10k buffer)
-> map(load_audio_segments 0.38 s) -> filter(silence -40 dB) ->
map(volume_normalize -16 dBFS)) and the code-crop mapping for s2a
(audio_loading_utils.py:9-58). Everything emits fixed-shape numpy batches so
the jitted device step never re-traces; multi-host sharding is
``examples[process_index::process_count]`` keyed on ``jax.process_index()``
(the accelerate per-rank dataloader equivalent, dump_tokens.py:152-179).
"""

from __future__ import annotations

import random
from typing import Callable, Iterable, Iterator

import numpy as np

from edm_tts_tpu.data.audio_io import load_audio
from edm_tts_tpu.ops.loudness import integrated_loudness, normalize_loudness
from edm_tts_tpu.ops.resample import resample_numpy


def shard_for_process(
    examples: Iterable, process_index: int, process_count: int
) -> Iterator:
    for i, ex in enumerate(examples):
        if i % process_count == process_index:
            yield ex


def shuffle_buffer(examples: Iterable, buffer_size: int, seed: int = 0) -> Iterator:
    rng = random.Random(seed)
    buf = []
    for ex in examples:
        if len(buf) < buffer_size:
            buf.append(ex)
            continue
        j = rng.randrange(buffer_size)
        yield buf[j]
        buf[j] = ex
    rng.shuffle(buf)
    yield from buf


def load_audio_segments(
    example: dict, target_sr: int, segment_seconds: float | None
) -> Iterator[dict]:
    """Load one manifest window, pad, resample, split into fixed segments,
    drop the short tail (reference load_audio_segments:61-96).

    If the example carries a ``_audio``/``_sr`` pair (attached by the native
    prefetcher, data/native_prefetch.py), the decode is already done on the
    C++ thread pool and no file IO happens here."""
    if "_audio" in example:
        audio, sr = example["_audio"], example["_sr"]
    else:
        audio, sr = load_audio(
            example["file"], example.get("offset", 0),
            example.get("num_frames", -1),
        )
        audio = audio[0]  # mono
    padding = example.get("padding", 0)
    if padding > 0:
        audio = np.pad(audio, (0, padding))
    if sr != target_sr:
        audio = resample_numpy(audio, sr, target_sr)
    if segment_seconds is None:
        yield {"id": example["id"] + "-0", "audio": audio.astype(np.float32)}
        return
    seg = int(segment_seconds * target_sr)
    n = len(audio) // seg
    for j in range(n):
        yield {
            "id": f"{example['id']}-{j}",
            "audio": audio[j * seg : (j + 1) * seg].astype(np.float32),
        }


def silence_filter(audio: np.ndarray, sample_rate: int, threshold_db: float = -40.0) -> bool:
    """Keep segments louder than the threshold (reference :99-104)."""
    return float(integrated_loudness(audio[None], sample_rate)[0]) > threshold_db


def volume_normalize(audio: np.ndarray, sample_rate: int, dbfs: float = -16.0) -> np.ndarray:
    return normalize_loudness(audio[None], sample_rate, dbfs)[0][0]


def codec_audio_pipeline(
    manifest: Iterable[dict],
    *,
    target_sr: int = 16000,
    segment_seconds: float = 0.38,
    silence_threshold_db: float = -40.0,
    normalize_dbfs: float = -16.0,
    shuffle: int = 10_000,
    seed: int = 42,
    repeat: bool = True,
    prefetch_threads: int = 0,
) -> Iterator[np.ndarray]:
    """Full codec-training example stream (one audio segment per yield).

    ``prefetch_threads > 0`` decodes FLAC windows ahead on the C++ thread
    pool (data/native_prefetch.py) — the analog of the reference's
    ``dataloader_num_workers: 32`` (/root/reference/run_codec_training.py:
    216-252); decode overlaps the loudness/normalize python work AND the
    device step (the pool releases the GIL)."""
    manifest = list(manifest)

    def one_pass(epoch_seed):
        examples = shuffle_buffer(iter(manifest), min(shuffle, max(len(manifest), 1)),
                                  seed=epoch_seed)
        if prefetch_threads > 0:
            from edm_tts_tpu.data.native_prefetch import prefetch_manifest

            examples = prefetch_manifest(examples, n_threads=prefetch_threads)
        for ex in examples:
            for seg in load_audio_segments(ex, target_sr, segment_seconds):
                a = seg["audio"]
                if not silence_filter(a, target_sr, silence_threshold_db):
                    continue
                yield volume_normalize(a, target_sr, normalize_dbfs)

    epoch = 0
    while True:
        yield from one_pass(seed + epoch)
        epoch += 1
        if not repeat:
            return


def crop_code_example(
    example: dict,
    segment_frames: int,
    rng: random.Random,
    random_segment: bool = True,
) -> dict | None:
    """Aligned random crop of acoustic+semantic token streams
    (reference load_code_segments:9-58); None if too short."""
    a = example["acoustic_tokens"]  # (Q, T)
    s = example["semantic_tokens"]  # (T,)
    t = min(a.shape[-1], s.shape[-1])
    if t < segment_frames:
        return None
    start = rng.randint(0, t - segment_frames) if random_segment else 0
    return {
        "acoustic_tokens": a[:, start : start + segment_frames],
        "semantic_tokens": s[start : start + segment_frames],
    }


def batched(examples: Iterator[dict | np.ndarray], batch_size: int,
            stack: Callable | None = None) -> Iterator:
    buf = []
    for ex in examples:
        buf.append(ex)
        if len(buf) == batch_size:
            yield stack(buf) if stack else buf
            buf = []
