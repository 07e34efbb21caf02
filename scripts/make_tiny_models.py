"""Export a mutually-consistent tiny model set + FLAC prompt for smoke runs.

Creates <out>/codec, <out>/hubert, <out>/s2a, <out>/t2s and prompt.flac —
the full inference.py surface with random weights (structure-exact).
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

# tiny models don't need the chip; EDM_TINY_CPU=1 skips the axon tunnel
# (env JAX_PLATFORMS=cpu does not override the plugin — post-import
# config.update does)
if os.environ.get("EDM_TINY_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec, CodecConfig
from edm_tts_tpu.models.hubert import HubertModel
from edm_tts_tpu.models.hubert.config import HubertConfig
from edm_tts_tpu.models.s2a import InjectionConformer, S2AConfig
from edm_tts_tpu.models.t2s import T2SConfig, TextToSemantic
from edm_tts_tpu.utils.hub import save_codec, save_hubert, save_s2a, save_t2s
from flac_encoder import encode_flac

out = sys.argv[1]
K = 32  # semantic vocab

rng = jax.random.PRNGKey(0)
codec_cfg = CodecConfig(encoder_dim=8, decoder_dim=64, n_codebooks=4,
                        codebook_size=64, codebook_dim=4)
codec = Codec(codec_cfg)
codec_params = jax.jit(codec.init)(rng, jnp.zeros((1, 640, 1)))
save_codec(f"{out}/codec", codec, codec_params)

hub_cfg = HubertConfig(
    conv_dim=(16,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
    conv_stride=(5, 2, 2, 2, 2, 2, 2), hidden_size=32,
    num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
)
hub_params = jax.jit(HubertModel(hub_cfg).init)(rng, jnp.zeros((1, 1280)))
centers = np.random.default_rng(0).standard_normal((K, 32)).astype(np.float32)
save_hubert(f"{out}/hubert", hub_cfg, hub_params, centers)

s2a_cfg = S2AConfig(hidden_size=64, num_semantic_tokens=K,
                    encoder_num_heads=4, encoder_num_layers=4,
                    injection_layers=(1, 2), encoder_attn_dropout=0.0,
                    encoder_ff_dropout=0.0, encoder_conv_dropout=0.0,
                    codec=codec_cfg)
s2a = InjectionConformer(s2a_cfg)
s2a_params = jax.jit(
    lambda r: s2a.init(r, jnp.zeros((1, 4, 8), jnp.int32),
                       jnp.zeros((1, 8), jnp.int32), mask_rng=r, train=False)
)(rng)
s2a_params = {"params": {**s2a_params["params"], "codec": codec_params["params"]}}
save_s2a(f"{out}/s2a", s2a, s2a_params)

t2s_cfg = T2SConfig(hidden_size=64, semantic_vocab_size=K,
                    main_encoder_num_heads=4, main_encoder_num_layers=2,
                    length_predictor_num_heads=4, length_predictor_num_layers=1)
t2s = TextToSemantic(t2s_cfg)
t2s_params = jax.jit(
    lambda r: t2s.init(
        r, jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool),
        jnp.zeros((1, 16), bool), jnp.zeros((1, 4), jnp.int32),
        jnp.ones((1, 4), bool), jnp.ones((1,)), mask_rng=r, train=False,
    )
)(rng)
save_t2s(f"{out}/t2s", t2s, t2s_params)

# 1.5 s speaker prompt flac (sine + noise)
sr = 16000
t = np.arange(int(1.5 * sr)) / sr
wav = 0.25 * np.sin(2 * np.pi * 220 * t) + 0.01 * np.random.default_rng(1).standard_normal(len(t))
ints = np.clip(wav * 32768, -32768, 32767).astype(np.int64)
with open(f"{out}/prompt.flac", "wb") as f:
    f.write(encode_flac(ints[None], sample_rate=sr, subframe_kind="fixed",
                        order=2, param=12))
print("exported tiny models to", out)
