"""The neural codec model: waveform <-> 12-level RVQ codes at 50 Hz.

API parity with the reference DAC
(/root/reference/edm_tts/models/dac/modeling_dac.py:22-235): ``encode`` /
``decode`` / ``encode_to_codes`` / ``decode_from_codes`` /
``codes_to_features(_unreduced)`` / ``features_to_codes`` /
``features_to_codebook_logits`` plus hop-multiple padding in ``pad_audio``.
The model is a pure flax module — every entry point is jittable with static
shapes; resampling/file-IO live host-side in the data layer.

Layouts (TPU channel-last): audio ``(B, T, 1)``; latents/features
``(B, T50, D)``; codes ``(B, Q, T50)``.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from edm_tts_tpu.models.codec.config import CodecConfig
from edm_tts_tpu.models.codec.decoder import Decoder
from edm_tts_tpu.models.codec.encoder import Encoder
from edm_tts_tpu.models.codec.rvq import ResidualVQ

Array = jax.Array


class Codec(nn.Module):
    config: CodecConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg.encoder_dim, cfg.encoder_rates, dtype=self.dtype)
        self.quantizer = ResidualVQ(
            input_dim=cfg.latent_dim,
            n_codebooks=cfg.n_codebooks,
            codebook_size=cfg.codebook_size,
            codebook_dim=cfg.codebook_dim,
            quantizer_dropout=cfg.quantizer_dropout,
        )
        self.decoder = Decoder(cfg.decoder_dim, cfg.decoder_rates, dtype=self.dtype)

    # -- full pass (training) ------------------------------------------------
    def __call__(
        self,
        audio: Array,
        n_quantizers: int | None = None,
        *,
        train: bool = False,
        rng: Array | None = None,
    ) -> dict[str, Array]:
        """Full encode->quantize->decode pass. ``audio``: (B, T, 1), T a hop
        multiple (use ``pad_audio``). Returns z/codes/latents/losses/audio."""
        out = self.encode(audio, n_quantizers, train=train, rng=rng)
        out["audio"] = self.decode(out["z"], length=audio.shape[-2])
        return out

    def encode(
        self,
        audio: Array,
        n_quantizers: int | None = None,
        *,
        train: bool = False,
        rng: Array | None = None,
    ) -> dict[str, Array]:
        z = self.encoder(audio)
        out = self.quantizer(z, n_quantizers, train=train, rng=rng)
        out["z_e"] = z
        return out

    def decode(
        self,
        z: Array,
        length: int | None = None,
        valid_frames: Array | None = None,
    ) -> Array:
        """Decode latents; the conv-transpose stack emits ``T*hop + 16``
        samples (stride-5 block adds +2 pre-upsample), so callers trim to
        ``length`` exactly like reference ``DAC.decode`` (modeling_dac.py:
        141-163, ``x[..., :length]``). ``valid_frames`` (``(B,)`` int)
        enables variable-length batched decode on a padded canvas with
        per-sample bit-parity to exact-size decoding (see Decoder)."""
        audio = self.decoder(z.astype(self.dtype), valid_frames)
        if length is not None:
            audio = audio[:, :length]
        return audio

    def decoded_length(self, n_frames: int) -> int:
        """Untrimmed decoder output length: each odd-stride block adds +2
        (torch ConvTranspose arithmetic with k=2s, p=floor(s/2), op=s%2)."""
        t = n_frames
        for s in self.config.decoder_rates:
            t = s * t + (2 if s % 2 else 0)
        return t

    # -- inference API -------------------------------------------------------
    def encode_to_codes(self, audio: Array, n_quantizers: int | None = None) -> Array:
        """``(B, T, 1)`` -> ``(B, Q, T/hop)`` int32 codes."""
        z = self.encoder(audio)
        return self.quantizer(z, n_quantizers)["codes"]

    def decode_from_codes(
        self, codes: Array, valid_frames: Array | None = None
    ) -> Array:
        """``(B, Q', T50)`` codes -> ``(B, T50*hop, 1)`` waveform."""
        return self.decode(
            self.quantizer.from_codes(codes), valid_frames=valid_frames
        )

    def codes_to_features(self, codes: Array) -> Array:
        """``(B, Q', T)`` -> summed quantized features ``(B, T, D)``."""
        return self.quantizer.from_codes(codes)

    def codes_to_features_unreduced(self, codes: Array) -> Array:
        """``(B, Q', T)`` -> per-level features ``(B, Q', T, D)``."""
        return self.quantizer.from_codes_unreduced(codes)

    def features_to_codes(self, features: Array) -> Array:
        """``(B, T, Q'*dc)`` projected latents -> ``(B, Q', T)`` codes."""
        return self.quantizer.from_latents(features)[-1]

    def features_to_codebook_logits(self, features: Array) -> Array:
        """``(B, T, D)`` -> residual distances ``(B, T, Q, N)``."""
        return self.quantizer.latents_to_codebook_dist(features)


def pad_audio_to_hop(audio: Array, hop_length: int) -> Array:
    """Right-pad waveform ``(..., T, 1)`` to the next hop multiple.

    Mirrors reference ``DAC.preprocess`` (modeling_dac.py:75-93) minus the
    resampling (host-side in our data layer).
    """
    t = audio.shape[-2]
    target = math.ceil(t / hop_length) * hop_length
    pad = [(0, 0)] * audio.ndim
    pad[-2] = (0, target - t)
    return jnp.pad(audio, pad)
