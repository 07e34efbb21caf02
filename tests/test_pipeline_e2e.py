"""Data-pipeline integration over synthetic FLAC files: manifest probing,
60 s windowing, segmenting, silence filter, loudness normalize, batching —
the codec-training input path end to end (and the dump_tokens collator)."""

import numpy as np
import pytest

from tests.flac_encoder import encode_flac


def _make_flac_dataset(root, n_files=2, seconds=3.0, sr=16000):
    (root / "small" / "spk" / "book").mkdir(parents=True)
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    for i in range(n_files):
        # audible sine + noise so the silence filter passes
        x = 0.3 * np.sin(2 * np.pi * (200 + 100 * i) * t)
        x = x + 0.01 * rng.standard_normal(len(t))
        ints = np.clip(x * 32768, -32768, 32767).astype(np.int64)
        data = encode_flac(ints[None], sample_rate=sr, subframe_kind="fixed",
                           order=2, param=12, blocksize=4096)
        (root / "small" / "spk" / "book" / f"utt{i}.flac").write_bytes(data)


def test_librilight_manifest_and_codec_pipeline(tmp_path):
    from edm_tts_tpu.data.collators import collate_codec_audio
    from edm_tts_tpu.data.manifests import librilight_manifest
    from edm_tts_tpu.data.pipeline import batched, codec_audio_pipeline

    _make_flac_dataset(tmp_path)
    manifest = list(librilight_manifest(str(tmp_path), "small",
                                        segment_seconds=2.0))
    # 3 s files in 2 s windows -> 2 windows per file, second padded
    assert len(manifest) == 4
    assert manifest[0]["num_frames"] == 32000
    assert manifest[1]["padding"] == 16000

    stream = codec_audio_pipeline(
        manifest, segment_seconds=0.38, shuffle=2, seed=0, repeat=False
    )
    batch = next(batched(stream, 4, stack=collate_codec_audio))
    assert batch.shape == (4, int(0.38 * 16000), 1)
    assert np.isfinite(batch).all()
    # volume-normalized segments should not be near-silent
    assert np.abs(batch).max() > 0.01


def test_dump_collator_alignment(tmp_path):
    """The pad-hack collator produces equal-length acoustic/semantic token
    streams through the full tokenizer (tiny codec + tiny 320x hubert)."""
    import jax
    import jax.numpy as jnp

    from edm_tts_tpu.data.collators import collate_dump_batch
    from edm_tts_tpu.data.manifests import librilight_manifest
    from edm_tts_tpu.models.codec import Codec, CodecConfig
    from edm_tts_tpu.models.hubert import HubertModel
    from edm_tts_tpu.models.hubert.config import HubertConfig
    from edm_tts_tpu.models.tokenizer import AudioTokenizer, SemanticTokenizerHubert

    _make_flac_dataset(tmp_path, n_files=1, seconds=1.0)
    windows = list(librilight_manifest(str(tmp_path), "small", segment_seconds=1.0))

    codec_cfg = CodecConfig(encoder_dim=4, decoder_dim=32, n_codebooks=2,
                            codebook_size=8, codebook_dim=4)
    codec = Codec(codec_cfg)
    codec_params = jax.jit(codec.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 640, 1)))
    hub_cfg = HubertConfig(
        conv_dim=(8,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2), hidden_size=16,
        num_hidden_layers=1, num_attention_heads=4, intermediate_size=32,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    sem = SemanticTokenizerHubert(hub_cfg)
    hub_params = jax.jit(HubertModel(hub_cfg).init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 1280))
    )
    sem_params = sem.make_params(hub_params, np.random.randn(8, 16))

    tok = AudioTokenizer(codec, sem)
    batch = collate_dump_batch(windows, tok)
    out = tok.compute_codes_batch(
        codec_params, sem_params,
        batch["normalized_audio"], batch["padded_audio"],
        batch["attention_mask"],
    )
    a, s = np.asarray(out["acoustic_codes"]), np.asarray(out["semantic_codes"])
    assert a.shape[-1] == s.shape[-1]
    n = int(batch["code_lengths"][0])
    assert n == 16000 // 320  # 1 s -> 50 tokens
    assert a.shape[-1] >= n
