"""Real-size codec GAN stability smoke: >=1k adversarial steps on the TPU.

De-risks the 100k-step reference recipe (configs/dac/train_config.yaml:62-67,
103) beyond the 40-step overfit test: full 70M generator + MPD x5/MRD x3
ensemble, 7-scale mel loss, both optimizers with the per-step gamma-0.999996
schedules, reference batch 32 x 0.38 s crops, on synthetic-but-structured
audio (harmonic mixtures + AM envelopes + noise). Logs G/D/mel trajectories
to a JSONL artifact and asserts (a) mel keeps improving and (b) neither
adversarial loss collapses to zero.

Usage:  python scripts/gan_stability_smoke.py [--steps 1000]
            [--out benchmarks/gan_stability_r3.jsonl]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.codec.discriminator import Discriminator, DiscriminatorConfig
from edm_tts_tpu.models.codec.losses import ReconstructionLoss
from edm_tts_tpu.train.gan import TrainState, gan_train_step
from edm_tts_tpu.train.optim import adamw, exponential_schedule


def synth_batches(n_batches: int, batch: int, seg: int, sr: int = 16000):
    """Structured synthetic speech-like audio: harmonic stacks with random
    f0, decaying partials, AM envelopes and a noise floor (deterministic)."""
    rng = np.random.default_rng(0)
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
        sig = 0.7 * sig / peak
        out.append(sig[:, :, None])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--out", default="benchmarks/gan_stability_r3.jsonl")
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
    batches = synth_batches(64, args.batch, seg)
    rng = jax.random.PRNGKey(0)
    g_params = jax.jit(codec.init)(rng, jax.numpy.zeros((1, seg, 1)))
    d_params = jax.jit(disc.init)(rng, jax.numpy.zeros((1, seg, 1)))

    g_tx = adamw(exponential_schedule(1e-4, 0.999996), b1=0.8, b2=0.99)
    d_tx = adamw(exponential_schedule(1e-4, 0.999996), b1=0.8, b2=0.99)
    g_state = TrainState.create(apply_fn=None, params=g_params, tx=g_tx)
    d_state = TrainState.create(apply_fn=None, params=d_params, tx=d_tx)

    rows = []
    t0 = time.time()
    metrics = None
    for step in range(args.steps):
        audio = batches[step % len(batches)]
        g_state, d_state, metrics = gan_train_step(
            codec, disc, recon, g_state, d_state, audio,
            jax.random.fold_in(rng, step),
        )
        if (step + 1) % args.log_every == 0 or step == 0:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            row = {
                "step": step + 1,
                "mel": m["mel/loss"],
                "gen": m["adv/gen_loss"],
                "disc": m["adv/disc_loss"],
                "feat": m.get("adv/feat_loss", m.get("adv/feature_loss", 0.0)),
                "loss": m["loss"],
                "elapsed_s": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")

    mel = np.array([r["mel"] for r in rows])
    disc_l = np.array([r["disc"] for r in rows])
    gen_l = np.array([r["gen"] for r in rows])
    k = max(len(rows) // 10, 1)
    head, tail = mel[:k].mean(), mel[-k:].mean()
    print(f"mel head {head:.3f} -> tail {tail:.3f} "
          f"({(1 - tail / head) * 100:.1f}% better); "
          f"disc tail {disc_l[-k:].mean():.4f}, gen tail {gen_l[-k:].mean():.4f}")
    assert np.isfinite(mel).all(), "non-finite mel loss"
    assert tail < 0.9 * head, "mel loss did not keep improving"
    assert disc_l[-k:].mean() > 1e-3, "discriminator loss collapsed to 0"
    assert gen_l[-k:].mean() > 1e-3, "generator adversarial loss collapsed"
    print(f"GAN stability smoke OK: {args.steps} steps, "
          f"{(time.time() - t0) / args.steps * 1e3:.0f} ms/step avg "
          f"(incl. compile)")


if __name__ == "__main__":
    main()
