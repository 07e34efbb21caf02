"""Realistic utterance-length mix through the serving engine (VERDICT r3 #3).

The r3 throughput numbers ran full 650-token canvases only; real traffic is
a length MIX, and the engine pads every utterance in a batch to the batch
max (TTSEngine.synthesize: n_max = bucket_length(max(gt))), so arrival-order
batching wastes canvas on the short rows. This measures that directly at
the engine level (no HTTP, no batcher thread — the scheduling policy is the
variable):

  64 utterances, durations 2.56/5.12/7.68/10.24 s (16 each, shuffled),
  one registered speaker, batch 16:
    (a) arrival order  — every batch mixed, canvas = its longest row
    (b) length-sorted  — homogeneous batches, canvas = exactly each length

(b)-(a) is the throughput a smarter scheduler (sort the queue by predicted
length before cutting batches) would buy; sorted-by-length batching is the
standard bucketing trick this quantifies on OUR stack. Four canvas programs
compile (128/256/384/512 + reuse of 512 for the mixed case).

Usage: python scripts/profile_lengthmix.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

sys.path.insert(0, "benchmarks")
from serving_throughput import build_engine  # noqa: E402

GTS = [128, 256, 384, 512]  # tokens at 50 Hz -> 2.56/5.12/7.68/10.24 s
N_EACH = 16
BATCH = 16


def run_batches(eng, order, label):
    batches = [order[i:i + BATCH] for i in range(0, len(order), BATCH)]
    # warm every program this order will engage
    for b in batches:
        eng.synthesize([t for t, _ in b], "bench", seed=0,
                       gt_lengths=[g for _, g in b])
    t0 = time.perf_counter()
    audio_s = 0.0
    for b in batches:
        wavs = eng.synthesize([t for t, _ in b], "bench", seed=1,
                              gt_lengths=[g for _, g in b])
        audio_s += sum(w.shape[0] for w in wavs) / eng.sample_rate
    dt = time.perf_counter() - t0
    print(f"{label:18s} {audio_s:7.1f} audio-s in {dt:6.2f} s wall "
          f"-> {audio_s / dt:7.1f} audio-s/s", flush=True)
    return audio_s / dt


def main():
    eng = build_engine()
    rng = np.random.default_rng(0)
    reqs = [(f"utterance number {i} with some padding text.", g)
            for i, g in enumerate(np.repeat(GTS, N_EACH))]
    mixed = [reqs[i] for i in rng.permutation(len(reqs))]
    sorted_r = sorted(mixed, key=lambda r: r[1])

    thr_sorted = run_batches(eng, sorted_r, "length-sorted")
    thr_mixed = run_batches(eng, mixed, "arrival order")
    print(f"scheduler headroom: {thr_sorted / thr_mixed:5.2f}x "
          f"(sorted / arrival)")


if __name__ == "__main__":
    main()
