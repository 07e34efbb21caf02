"""Data-layer tests: text norm, token shards, collators, resample, loudness."""

import numpy as np

from edm_tts_tpu.data.collators import collate_t2s, t2s_filter
from edm_tts_tpu.data.text_norm import clean_text, normalize_text
from edm_tts_tpu.data.token_shards import TokenShardWriter, iter_token_shards
from edm_tts_tpu.models.t2s.config import SPECIAL_TOKENS
from edm_tts_tpu.ops.loudness import integrated_loudness, normalize_loudness
from edm_tts_tpu.ops.resample import resample_numpy


def test_normalize_text():
    assert normalize_text("Hello, world! it’s 42.") == "HELLO WORLD IT'S 42"
    assert normalize_text("  a   b  ") == "A B"


def test_clean_text():
    assert clean_text("hi，there。") == "hi,there."
    assert clean_text("“x”") == '"x"'


def test_token_shards_roundtrip(tmp_path):
    w = TokenShardWriter(str(tmp_path), rank=0, items_per_shard=2)
    a0 = np.arange(24, dtype=np.int16).reshape(12, 2)
    s0 = np.array([1, 2], np.int16)
    w.add("u0", a0, s0, text="hi", text_bytes=[104, 105])
    w.add("u1", a0 + 1, s0 + 1)
    w.add("u2", a0 + 2, s0 + 2)
    w.close()
    items = list(iter_token_shards(str(tmp_path)))
    assert [it["id"] for it in items] == ["u0", "u1", "u2"]
    np.testing.assert_array_equal(items[0]["acoustic_tokens"], a0)
    np.testing.assert_array_equal(items[2]["semantic_tokens"], s0 + 2)
    assert items[0]["transcription"] == "hi"
    assert items[0]["transcription_bytes"] == [104, 105]


def test_collate_t2s_layout():
    ex = {
        "transcription_bytes": [65, 66],  # "AB"
        "semantic_tokens": [7, 8, 9],
    }
    out = collate_t2s([ex], pad_to_multiple=8)
    ids = out["input_ids"][0]
    assert ids[0] == SPECIAL_TOKENS["text"]
    assert list(ids[1:3]) == [70, 71]  # bytes + 5
    assert ids[3] == SPECIAL_TOKENS["sep"]
    assert ids[4] == SPECIAL_TOKENS["speech"]
    assert list(ids[5:8]) == [7 + 261, 8 + 261, 9 + 261]
    assert ids[8] == SPECIAL_TOKENS["sep"]
    assert out["attention_mask"][0].sum() == 9
    assert out["speech_mask"][0].sum() == 3
    assert out["speech_mask"][0, 5:8].all()
    assert out["speech_lengths"][0] == 3.0
    assert list(out["text_ids"][0][:2]) == [70, 71]


def test_t2s_filter():
    ok = {"semantic_tokens": [0] * 100, "transcription_bytes": [0] * 50}
    too_short = {"semantic_tokens": [0] * 10, "transcription_bytes": [0] * 5}
    text_longer = {"semantic_tokens": [0] * 100, "transcription_bytes": [0] * 200}
    assert t2s_filter(ok)
    assert not t2s_filter(too_short)
    assert not t2s_filter(text_longer)


def test_resample_preserves_sine():
    sr1, sr2, f = 24000, 16000, 440.0
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = resample_numpy(x, sr1, sr2)
    assert y.shape[0] == 16000
    # measure dominant frequency in the resampled signal
    spec = np.abs(np.fft.rfft(y[1000:-1000]))
    got = spec.argmax() / len(y[1000:-1000]) * sr2
    assert abs(got - f) < 2.0
    # amplitude preserved within a few percent
    assert abs(np.abs(y[1000:-1000]).max() - 1.0) < 0.05


def test_loudness_sine_reference():
    """A full-scale 997 Hz sine is ~-3.01 LUFS (BS.1770 K-weighting at 1 kHz
    is ~0 dB); accept a small tolerance."""
    sr = 16000
    t = np.arange(sr * 2) / sr
    x = np.sin(2 * np.pi * 997.0 * t)
    loud = float(integrated_loudness(x[None], sr)[0])
    assert abs(loud - (-3.01)) < 0.6


def test_normalize_loudness_hits_target():
    sr = 16000
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(sr * 2) * 0.05).astype(np.float32)
    y, input_db = normalize_loudness(x[None], sr, -16.0)
    after = float(integrated_loudness(y, sr)[0])
    assert abs(after - (-16.0)) < 0.5
    assert np.abs(y).max() <= 1.0
