"""Real-size codec GAN training step on the TPU: compile + a few steps.

De-risks run_codec_training.py on hardware: full generator (12-book RVQ),
MPD x5 + MRD x3 ensemble, 7-scale mel loss, both optimizers, 0.38 s crops at
reference batch 32.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.codec.discriminator import Discriminator, DiscriminatorConfig
from edm_tts_tpu.models.codec.losses import ReconstructionLoss
from edm_tts_tpu.train.gan import TrainState, gan_train_step
from edm_tts_tpu.train.optim import adamw, exponential_schedule

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

batch, seg = 32, int(0.38 * 16000)
rng = jax.random.PRNGKey(0)
audio = jax.random.normal(rng, (batch, seg, 1)) * 0.1
print("init...", flush=True)
g_params = jax.jit(codec.init)(rng, audio[:1])
d_params = jax.jit(disc.init)(rng, audio[:1])
print("g params:", sum(x.size for x in jax.tree_util.tree_leaves(g_params)) / 1e6, "M")
print("d params:", sum(x.size for x in jax.tree_util.tree_leaves(d_params)) / 1e6, "M")

tx = adamw(exponential_schedule(1e-4, 0.999996), b1=0.8, b2=0.99)
g_state = TrainState.create(apply_fn=None, params=g_params, tx=tx)
d_state = TrainState.create(apply_fn=None, params=d_params, tx=tx)

t0 = time.time()
g_state, d_state, m = gan_train_step(codec, disc, recon, g_state, d_state,
                                     audio, jax.random.PRNGKey(1))
m0 = {k: float(v) for k, v in jax.device_get(m).items()}
print(f"compile+step1: {time.time() - t0:.1f}s  loss={m0['loss']:.3f} "
      f"disc={m0['adv/disc_loss']:.3f} mel={m0['mel/loss']:.3f}", flush=True)

t0 = time.time()
n = 5
for i in range(n):
    g_state, d_state, m = gan_train_step(codec, disc, recon, g_state, d_state,
                                         audio, jax.random.PRNGKey(2 + i))
m = {k: float(v) for k, v in jax.device_get(m).items()}
dt = (time.time() - t0) / n
print(f"step time: {dt * 1e3:.0f} ms ({batch / dt:.0f} segments/s, "
      f"{batch * 0.38 / dt:.1f} audio-s/s)  loss={m['loss']:.3f}")
assert np.isfinite(m["loss"]) and np.isfinite(m["adv/disc_loss"])
print("GAN step on TPU: OK")
