"""Export a random DEFAULT-size codec for the s2a long run.

The s2a recipe (configs/injection_conformer/longrun_tpu.yaml) loads its
frozen acoustic codec from `acoustic_model_path` exactly like the
reference (/root/reference/edm_tts/models/injection_conformer/
modeling_injection_conformer.py:48-52 loads a pretrained DAC). For the
long-run *machinery* proof the codec only tokenizes synthetic shards that
were generated directly as tokens, so random weights at the real
architecture shape are sufficient — what matters is that load_codec,
param freezing, and the embedding table shapes are the production ones.

Usage: EDM_PLATFORM=cpu python scripts/export_random_codec.py /tmp/s2a_longrun_codec
"""

import sys

sys.path.insert(0, ".")

from edm_tts_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.utils.hub import save_codec

out = sys.argv[1]
cfg = CodecConfig()  # reference DAC defaults: 12 codebooks x 1024, 16 kHz
codec = Codec(cfg)
params = jax.jit(codec.init)(jax.random.PRNGKey(0), jnp.zeros((1, 640, 1)))
save_codec(out, codec, params)
print(f"exported default-size codec ({cfg.n_codebooks}x{cfg.codebook_size}) to {out}")
