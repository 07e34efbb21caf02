"""Long-horizon codec GAN run on the TPU through the REAL GANTrainer.

VERDICT r3 #5: the 1k-step smoke (gan_stability_smoke.py) proved the
adversarial losses don't collapse, but it drove `gan_train_step` directly —
no eval curve, no checkpoints, and preemption/resume had only ever been
exercised by the tiny CPU test (test_preemption.py). This run is the full
production loop at real size (70M generator + MPD/MRD ensemble, reference
batch 32 x 0.38 s crops, per-step gamma schedules — configs/dac/
train_config.yaml:62-67,103): GANTrainer with a HELD-OUT eval set (5 s
segments from a disjoint synthesis seed, the reference's
validation_segment_length), periodic orbax checkpoints with retention,
best-generator export, and — run live on the chip — a SIGTERM mid-run that
must checkpoint-and-stop, followed by a resume that continues the curve
without a discontinuity.

Protocol (two invocations of this script, same --out_dir):
  1. python scripts/gan_longrun_tpu.py --steps 10000 &   # note the pid
     sleep <until ~step 4000>; kill -TERM <pid>          # live preemption
  2. python scripts/gan_longrun_tpu.py --steps 10000     # auto-resumes
The train/eval curves land in <out_dir>/metrics.jsonl (MetricLogger);
copy to benchmarks/gan_longrun_r4.jsonl for the committed artifact.

Synthetic-but-structured audio (same generator as the smoke, harmonics +
AM + noise); train and eval draw from disjoint numpy seeds so eval mel is
a true held-out generalization curve, not memorization of the 64-batch
training cycle.
"""

import argparse
import itertools
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.codec.discriminator import Discriminator, DiscriminatorConfig
from edm_tts_tpu.models.codec.losses import ReconstructionLoss
from edm_tts_tpu.train.gan_trainer import GANTrainer, GANTrainingArguments


def synth_batches(n_batches, batch, seg, seed, sr=16000):
    """Harmonic stacks + AM envelopes + noise floor (deterministic per seed);
    train/eval disjointness comes from the seed."""
    rng = np.random.default_rng(seed)
    t = np.arange(seg) / sr
    out = []
    for _ in range(n_batches):
        sig = np.zeros((batch, seg), np.float32)
        f0 = rng.uniform(80, 380, batch)
        for h in range(1, 6):
            amp = (0.4 / h) * rng.uniform(0.5, 1.0, batch)
            phase = rng.uniform(0, 2 * np.pi, batch)
            sig += amp[:, None] * np.sin(
                2 * np.pi * h * f0[:, None] * t[None, :] + phase[:, None]
            ).astype(np.float32)
        env_f = rng.uniform(1.5, 6.0, batch)
        env = 0.55 + 0.45 * np.sin(2 * np.pi * env_f[:, None] * t[None, :])
        sig = sig * env.astype(np.float32)
        sig += 0.01 * rng.standard_normal((batch, seg)).astype(np.float32)
        peak = np.abs(sig).max(axis=1, keepdims=True) + 1e-6
        out.append((0.7 * sig / peak)[:, :, None])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out_dir", default="/tmp/gan_longrun_r4")
    args = ap.parse_args()

    cfg = CodecConfig()
    codec = Codec(cfg)
    disc = Discriminator(DiscriminatorConfig())
    recon = ReconstructionLoss(
        16000,
        mel_spectrogram_args={
            "n_mels": (5, 10, 20, 40, 80, 160, 320),
            "window_lengths": (32, 64, 128, 256, 512, 1024, 2048),
            "mel_fmin": (0.0,) * 7,
            "mel_fmax": (None,) * 7,
            "mag_weight": 0.0,
        },
    )

    seg = int(0.38 * 16000)
    train_batches = synth_batches(64, args.batch, seg, seed=0)
    # held-out: validation_segment_length 5.0 s (reference train_config.yaml),
    # disjoint seed, 4 x B4 batches
    eval_batches = synth_batches(4, 4, 5 * 16000, seed=12345)

    rng = jax.random.PRNGKey(0)
    g_params = jax.jit(codec.init)(rng, jax.numpy.zeros((1, seg, 1)))
    d_params = jax.jit(disc.init)(rng, jax.numpy.zeros((1, seg, 1)))

    targs = GANTrainingArguments(
        output_dir=args.out_dir,
        max_steps=args.steps,
        logging_steps=50,
        eval_steps=500,
        save_steps=1000,
        save_total_limit=2,
        num_samples_to_log=2,
    )
    trainer = GANTrainer(targs, codec, disc, g_params, d_params, recon)
    t0 = time.time()
    trainer.train(
        itertools.cycle(train_batches), eval_batches, config_json="{}"
    )
    print(f"done in {time.time() - t0:.0f}s (resume-aware; see "
          f"{args.out_dir}/metrics.jsonl)", flush=True)


if __name__ == "__main__":
    main()
