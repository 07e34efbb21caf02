"""Synthetic-but-LEARNABLE token shards for the s2a/t2s long runs.

The GAN long run (scripts/gan_longrun_tpu.py) proved the codec loop on
structured synthetic audio; this is the token-model analog (VERDICT r4 #3):
shards in the native TokenShardWriter format whose masked-prediction tasks
are actually learnable, so a descending loss curve measures the TRAINING
MACHINERY (Trainer, microbatch accumulation, schedule, checkpoint/resume)
and not just kernel throughput.

Structure (all deterministic given --seed; train/eval disjoint by seed):

- s2a: semantic tokens follow a peaked Markov chain; acoustic level q at
  frame t is ``(sem[t] * P_q + O_q) % 1024`` with 10% uniform-random
  replacement — so masked acoustic CE can descend from ~ln(1024)=6.93
  toward the ~0.1-noise floor but not to zero (a flatline at 6.93 or a
  crash to 0 both indicate a bug).
- t2s: text is words over a 64-word vocabulary; the semantic stream is a
  byte-driven expansion ``(byte[t//4]*7 + (t%4)*131) % 1024`` with 5%
  noise, and the speech length is ~4.2x the byte length (so the length
  predictor's log-L1 target is learnable too). Mirrors the reference
  text_speech_codes_dataset.py:20-98 record schema.

Usage:
  python scripts/make_token_shards.py --kind s2a --out_dir /tmp/tok_s2a \
      --n_items 512 --seed 0
  python scripts/make_token_shards.py --kind t2s --out_dir /tmp/tok_t2s \
      --n_items 2048 --seed 0
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

from edm_tts_tpu.data.token_shards import TokenShardWriter

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47])
OFFSETS = np.array([q * 83 for q in range(12)])
WORDS = [
    "".join(chr(97 + (i * 7 + j * 3) % 26) for j in range(3 + i % 5))
    for i in range(64)
]


def semantic_chain(rng: np.random.Generator, t: int) -> np.ndarray:
    """Peaked order-1 Markov chain over 1024 states."""
    steps = rng.choice([1, 3, 7, 31], size=t, p=[0.7, 0.1, 0.1, 0.1])
    return (np.cumsum(steps) + rng.integers(0, 1024)) % 1024


def acoustic_from_semantic(rng: np.random.Generator, sem: np.ndarray) -> np.ndarray:
    ac = (sem[None, :] * PRIMES[:, None] + OFFSETS[:, None]) % 1024
    noise = rng.random(ac.shape) < 0.10
    return np.where(noise, rng.integers(0, 1024, ac.shape), ac)


def make_s2a_item(rng: np.random.Generator, i: int):
    t = int(rng.integers(800, 1600))
    sem = semantic_chain(rng, t)
    ac = acoustic_from_semantic(rng, sem)
    return f"s2a_{i}", ac, sem, None, None


def make_t2s_item(rng: np.random.Generator, i: int):
    n_words = int(rng.integers(8, 40))
    text = " ".join(WORDS[j] for j in rng.integers(0, 64, n_words))
    tb = list(text.encode("utf-8"))
    lt = len(tb)
    # speech length ~ 4.2x byte length, clipped into the t2s filter window
    t = int(np.clip(round(4.2 * lt + rng.integers(-8, 9)), lt + 1, 1249))
    b = np.asarray(tb, np.int64)
    pos = np.minimum(np.arange(t) // 4, lt - 1)
    sem = (b[pos] * 7 + (np.arange(t) % 4) * 131) % 1024
    noise = rng.random(t) < 0.05
    sem = np.where(noise, rng.integers(0, 1024, t), sem)
    ac = acoustic_from_semantic(rng, sem)
    return f"t2s_{i}", ac, sem, text, tb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["s2a", "t2s"], required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--n_items", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--items_per_shard", type=int, default=256)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    writer = TokenShardWriter(
        args.out_dir, rank=0, items_per_shard=args.items_per_shard
    )
    make = make_s2a_item if args.kind == "s2a" else make_t2s_item
    frames = 0
    for i in range(args.n_items):
        item_id, ac, sem, text, tb = make(rng, i)
        writer.add(item_id, ac, sem, text=text, text_bytes=tb)
        frames += sem.shape[0]
    writer.close()
    print(
        f"wrote {args.n_items} {args.kind} items ({frames} frames, "
        f"{frames / 50.0:.0f} audio-s equivalent) to {args.out_dir}"
    )


if __name__ == "__main__":
    main()
