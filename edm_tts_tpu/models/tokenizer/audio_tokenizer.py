"""Joint audio tokenizer: aligned acoustic (codec RVQ) + semantic (HuBERT
k-means) token streams from raw audio.

Re-design of the reference AudioTokenizer
(/root/reference/edm_tts/models/audio_tokenizer/audio_tokenizer.py):

- the alignment-critical **padding hack** is preserved bit-exactly
  (:34-39): pad to the next hop (320) multiple split left/right, then add
  hop/4 = 80 extra samples on each side — this makes the codec conv stack
  and HuBERT's conv stack emit the SAME number of frames (verified in
  tests/test_ops_convolution.py);
- volume normalization to -16 dBFS via BS.1770 loudness happens on the host
  (ops/loudness.py) before the jitted device encode, mirroring
  ``volume_normalize`` (:41-47) — the semantic stream sees the UNnormalized
  (padded) audio exactly like the reference (:49-53);
- ``get_code_lengths`` walks the same conv arithmetic (:80-89).

Device work (codec encode + HuBERT + k-means) is one jittable call; file IO
and resampling live in the data layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.models.codec import Codec
from edm_tts_tpu.models.tokenizer.semantic_hubert import SemanticTokenizerHubert
from edm_tts_tpu.ops.convolution import encoder_output_length
from edm_tts_tpu.ops.loudness import normalize_loudness

Array = jax.Array


class AudioTokenizer:
    def __init__(self, codec: Codec, semantic: SemanticTokenizerHubert | None):
        """``semantic=None`` builds a codec-only tokenizer: decode and
        acoustic encode work, ``compute_codes`` does not — enough for
        serving with precomputed prompt codes
        (serving/engine.py::register_speaker_codes)."""
        self.codec = codec
        self.semantic = semantic
        self.sample_rate = codec.config.sample_rate
        if semantic is not None:
            assert self.sample_rate == semantic.sample_rate

    @property
    def downsample_factor(self) -> int:
        return self.codec.config.hop_length  # 320

    def pad(self, audio: np.ndarray) -> np.ndarray:
        """The alignment pad hack (host-side, shape-static per bucket)."""
        d = self.downsample_factor
        t = audio.shape[-1]
        pad_val = (d - t % d) % d
        left, right = pad_val // 2, pad_val - pad_val // 2
        extra = d // 4
        return np.pad(
            audio,
            [(0, 0)] * (audio.ndim - 1) + [(left + extra, right + extra)],
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode_device(
        self,
        codec_params,
        semantic_params,
        normalized_audio: Array,
        padded_audio: Array,
        attention_mask: Array | None = None,
    ) -> dict[str, Array]:
        acoustic = self.codec.apply(
            codec_params, normalized_audio[..., None], method="encode_to_codes"
        )
        semantic = self.semantic.encode(semantic_params, padded_audio, attention_mask)
        return {"acoustic_codes": acoustic, "semantic_codes": semantic}

    def compute_codes(
        self, codec_params, semantic_params, audio_batch: np.ndarray
    ) -> dict:
        """``(B, T)`` host waveform -> aligned token streams.

        Returns acoustic_codes (B, Q, T'), semantic_codes (B, T'), input_db.
        """
        padded = self.pad(np.asarray(audio_batch, np.float32))
        normalized, input_db = normalize_loudness(padded, self.sample_rate, -16.0)
        out = self._encode_device(
            codec_params,
            semantic_params,
            jnp.asarray(normalized),
            jnp.asarray(padded),
        )
        a, s = out["acoustic_codes"], out["semantic_codes"]
        if a.shape[-1] != s.shape[-1]:
            raise ValueError(
                f"acoustic/semantic code length mismatch: {a.shape} vs {s.shape}"
            )
        return {
            "acoustic_codes": a,
            "semantic_codes": s,
            "input_db": input_db,
        }

    def compute_codes_batch(
        self,
        codec_params,
        semantic_params,
        normalized_audio,
        padded_audio,
        attention_mask=None,
    ) -> dict:
        """Pre-collated batched path (the dump_tokens hot loop,
        reference :66-78): inputs already padded + normalized host-side."""
        return self._encode_device(
            codec_params,
            semantic_params,
            jnp.asarray(normalized_audio),
            jnp.asarray(padded_audio),
            jnp.asarray(attention_mask) if attention_mask is not None else None,
        )

    def compute_codes_from_file(
        self, codec_params, semantic_params, file_path: str,
        offset: int = 0, num_frames: int = -1,
    ) -> dict:
        """Load + resample an audio file and tokenize it (reference
        ``compute_codes_from_file``, audio_tokenizer.py:91-101)."""
        from edm_tts_tpu.data.audio_io import load_audio
        from edm_tts_tpu.ops.resample import resample_numpy

        audio, sr = load_audio(file_path, offset, num_frames)
        wav = audio[0]
        if sr != self.sample_rate:
            wav = resample_numpy(wav, sr, self.sample_rate)
        return self.compute_codes(codec_params, semantic_params, wav[None])

    def get_code_lengths(self, input_lengths) -> np.ndarray:
        """Token count for given (padded) audio lengths — the codec encoder
        conv-arithmetic walk (reference :80-89)."""
        return np.asarray(
            encoder_output_length(
                np.asarray(input_lengths), self.codec.config.encoder_rates
            )
        )
