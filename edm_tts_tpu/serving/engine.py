"""Production TTS engine: the staged zero-shot pipeline behind a
bucket-everything, compile-once serving surface.

The reference deploys through a hand-run script that synthesizes one
exact-size utterance at a time (/root/reference/inference.py:36-56) — every
new text length is a new shape. This engine makes the pipeline servable on
TPU, where jit compiles per shape: text length, speech-canvas length and
batch size are all rounded up to fixed buckets and the padding is masked
(``semantic_valid`` in the s2a sampler, ``valid_frames`` in the decoder, row
masks for batch pads), so a steady-state server touches only a small, warm
set of compiled programs. Correctness of padded canvases vs exact-size ones
is pinned by tests/test_bucketed_inference.py; batch-pad row independence by
tests/test_serving.py.

Speaker prompts are tokenized once at registration (the expensive HuBERT +
codec encode) and reused across requests — the zero-shot analog of a KV
cache.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from edm_tts_tpu.utils.bucketing import bucket_batch, bucket_length

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SpeakerPrompt:
    acoustic_codes: Array  # (1, Q, Tp)
    semantic_codes: Array  # (1, Tp)


class TTSEngine:
    def __init__(
        self,
        codec_model: str,
        t2s_model: str,
        s2a_model: str,
        hubert_model: str,
        *,
        dtype=jnp.bfloat16,
        quantize: str | None = "none",
        quantize_t2s: str | None = None,
        quantize_s2a: str | None = None,
        **opts,
    ):
        quantize = quantize or "none"
        from edm_tts_tpu.utils.hub import (
            build_audio_tokenizer,
            load_s2a,
            load_t2s,
        )

        tokenizer, codec_params, sem_params = build_audio_tokenizer(
            codec_model, hubert_model, dtype=dtype
        )
        s2a, s2a_params = load_s2a(
            s2a_model, dtype=dtype, quantize=quantize_s2a or quantize
        )
        t2s, t2s_params = load_t2s(
            t2s_model, dtype=dtype, quantize=quantize_t2s or quantize
        )
        self._setup(tokenizer, codec_params, sem_params, s2a, s2a_params,
                    t2s, t2s_params, **opts)

    @classmethod
    def from_models(
        cls, tokenizer, codec_params, sem_params, s2a, s2a_params,
        t2s, t2s_params, **opts,
    ) -> "TTSEngine":
        """Build an engine from in-memory models/params — serve straight
        off a training run's state without an export round-trip.
        ``sem_params`` may be None if speakers are registered via
        ``register_speaker_codes`` (no HuBERT tokenization needed)."""
        self = cls.__new__(cls)
        self._setup(tokenizer, codec_params, sem_params, s2a, s2a_params,
                    t2s, t2s_params, **opts)
        return self

    def _setup(
        self, tokenizer, codec_params, sem_params, s2a, s2a_params,
        t2s, t2s_params, *,
        pred_iters: int = 16,
        s2a_steps: int = 8,
        temperature: float = 1.0,
        max_speech_len: int = 1250,
        text_bucket: int = 32,
        length_bucket: int = 64,
        batch_buckets: tuple[int, ...] = (1, 2, 4, 8, 16),
        mesh=None,
    ):
        self.tokenizer = tokenizer
        self._codec_params = codec_params
        self._sem_params = sem_params
        self._s2a, self._s2a_params = s2a, s2a_params
        self._t2s, self._t2s_params = t2s, t2s_params
        # multi-chip data-parallel serving: batches shard over the mesh's
        # ``data`` axis (params replicated once here); every batch bucket
        # must be divisible by the data-axis size. Per-request math is
        # unchanged (same PRNG, same canvas); outputs agree with
        # single-device serving to float tolerance (the partitioned
        # programs fuse differently — test_serving.py pins this).
        self._mesh = mesh
        if mesh is not None:
            from edm_tts_tpu.parallel.mesh import batch_sharding, replicated

            n_data = mesh.shape["data"]
            assert all(b % n_data == 0 for b in batch_buckets), (
                f"batch buckets {batch_buckets} must be divisible by the "
                f"data axis ({n_data})"
            )
            self._dp_shard = batch_sharding(mesh)
            rep = replicated(mesh)
            self._s2a_params = jax.device_put(self._s2a_params, rep)
            self._t2s_params = jax.device_put(self._t2s_params, rep)
            self._codec_params = jax.device_put(self._codec_params, rep)
        self.pred_iters = pred_iters
        self.s2a_steps = s2a_steps
        self.temperature = temperature
        self.max_speech_len = max_speech_len
        self.text_bucket = text_bucket
        self.length_bucket = length_bucket
        self.batch_buckets = tuple(sorted(batch_buckets))
        self._decode = jax.jit(
            lambda p, c, vf: self.tokenizer.codec.apply(
                p, c, vf, method="decode_from_codes"
            )
        )
        self._speakers: dict[str, SpeakerPrompt] = {}

    # -- speakers -------------------------------------------------------
    @property
    def sample_rate(self) -> int:
        return self.tokenizer.sample_rate

    def register_speaker(self, name: str, wav: np.ndarray, sr: int) -> None:
        """Tokenize a speaker prompt once; reuse for every request."""
        from edm_tts_tpu.ops.resample import resample_numpy

        if sr != self.tokenizer.sample_rate:
            wav = resample_numpy(wav, sr, self.tokenizer.sample_rate)
        codes = self.tokenizer.compute_codes(
            self._codec_params, self._sem_params, np.asarray(wav)[None]
        )
        self._speakers[name] = SpeakerPrompt(
            codes["acoustic_codes"], codes["semantic_codes"]
        )

    def register_speaker_codes(
        self, name: str, acoustic_codes, semantic_codes
    ) -> None:
        """Register precomputed prompt codes (``(1, Q, Tp)`` acoustic,
        ``(1, Tp)`` semantic) — e.g. from an offline dump_tokens pass."""
        self._speakers[name] = SpeakerPrompt(
            jnp.asarray(acoustic_codes), jnp.asarray(semantic_codes)
        )

    def speakers(self) -> tuple[str, ...]:
        return tuple(self._speakers)

    # -- synthesis ------------------------------------------------------
    def synthesize(
        self,
        texts: list[str],
        speaker: str,
        *,
        seed: int = 0,
        gt_lengths: list[int] | None = None,
    ) -> list[np.ndarray]:
        """Synthesize a batch of texts with one registered speaker.

        Returns one float32 waveform (n_samples,) per text, trimmed to its
        own predicted length. The batch is padded up to the next batch
        bucket by repeating row 0; padded rows are computed and discarded
        (batch elements are independent through every stage)."""
        from edm_tts_tpu.models.s2a import s2a_sample
        from edm_tts_tpu.models.t2s import t2s_sample

        prompt = self._speakers[speaker]
        b_real = len(texts)
        assert b_real >= 1
        b = bucket_batch(b_real, self.batch_buckets)

        byte_seqs = [[c + 5 for c in t.encode("utf-8")] for t in texts]
        byte_seqs += [byte_seqs[0]] * (b - b_real)
        lt = bucket_length(max(len(s) for s in byte_seqs), self.text_bucket)
        text_tokens = jnp.asarray(
            [s + [0] * (lt - len(s)) for s in byte_seqs], jnp.int32
        )
        text_lengths = jnp.asarray([len(s) for s in byte_seqs], jnp.int32)

        gt = None
        if gt_lengths is not None:
            gt = jnp.asarray(
                list(gt_lengths) + [gt_lengths[0]] * (b - b_real), jnp.int32
            )

        if self._mesh is not None:
            text_tokens = jax.device_put(text_tokens, self._dp_shard)
            text_lengths = jax.device_put(text_lengths, self._dp_shard)
            if gt is not None:
                gt = jax.device_put(gt, self._dp_shard)

        rng = jax.random.PRNGKey(seed)
        k_t2s, k_s2a = jax.random.split(rng)

        t2s_out = t2s_sample(
            self._t2s, self._t2s_params, text_tokens, text_lengths, k_t2s,
            pred_iters=self.pred_iters, temperature=self.temperature,
            max_speech_len=self.max_speech_len, gt_length=gt,
        )
        lengths = np.asarray(t2s_out["lengths"])
        n_max = bucket_length(
            int(lengths.max()), self.length_bucket, self.max_speech_len
        )
        semantic_tokens = t2s_out["semantic_tokens"][:, :n_max]
        lengths_dev = jnp.asarray(lengths, jnp.int32)
        semantic_valid = jnp.arange(n_max)[None, :] < lengths_dev[:, None]

        pa = prompt.acoustic_codes
        ps = prompt.semantic_codes
        pa = jnp.broadcast_to(pa, (b, *pa.shape[1:]))
        ps = jnp.broadcast_to(ps, (b, *ps.shape[1:]))
        if self._mesh is not None:
            lengths_dev = jax.device_put(lengths_dev, self._dp_shard)
            semantic_valid = jax.device_put(semantic_valid, self._dp_shard)
            pa = jax.device_put(pa, self._dp_shard)
            ps = jax.device_put(ps, self._dp_shard)
        acoustic_codes = s2a_sample(
            self._s2a, self._s2a_params, semantic_tokens,
            pa, ps,
            k_s2a, steps=self.s2a_steps, temperature=self.temperature,
            semantic_valid=semantic_valid,
        )
        audio = np.asarray(
            self._decode(self._codec_params, acoustic_codes, lengths_dev),
            dtype=np.float32,
        )
        ds = self.tokenizer.downsample_factor
        return [
            audio[i, : int(lengths[i]) * ds, 0] for i in range(b_real)
        ]

    def synthesize_long(
        self,
        text: str,
        speaker: str,
        *,
        seed: int = 0,
        max_chunk_chars: int | None = None,
        crossfade_ms: float = 30.0,
        gap_ms: float = 0.0,
    ) -> np.ndarray:
        """Synthesize arbitrarily long text as one waveform.

        The t2s canvas bounds a single request to ``max_speech_len`` frames
        (~25 s at full size — the reference cannot synthesize past it at
        all). This splits the text at sentence boundaries into chunks the
        canvas can hold (`serving/chunking.py`), synthesizes them as
        batched calls (chunks of one document become rows of one TPU
        dispatch — the batch dimension serving wants anyway), and joins
        the chunk waveforms with a short crossfade (or a silence gap).

        Library/CLI surface: dispatches on the calling thread. In a server
        with a live DynamicBatcher, use the HTTP ``"long": true`` path
        instead — it routes chunks through the shared batcher (one
        dispatching thread, and chunks coalesce with concurrent short
        requests)."""
        from edm_tts_tpu.serving.chunking import (
            default_chunk_chars,
            join_waveforms,
            split_text,
        )

        if max_chunk_chars is None:
            max_chunk_chars = default_chunk_chars(self.max_speech_len)
        chunks = split_text(text, max_chunk_chars)
        cap = max(self.batch_buckets)
        wavs: list[np.ndarray] = []
        for i in range(0, len(chunks), cap):
            wavs += self.synthesize(chunks[i : i + cap], speaker, seed=seed)
        return join_waveforms(
            wavs, self.sample_rate,
            crossfade_ms=crossfade_ms, gap_ms=gap_ms,
        )
