"""Native FLAC decoder seeking: SEEKTABLE fast path, binary-search fallback,
and the O(window) decoded-work bound.

The reference's data layer seeks via sox/torchaudio
(edm_tts/datasets/librilight.py:82, audio_loading_utils.py:63); without
seeking, dumping N windows of an hours-long LibriLight file is O(N^2) in
decoded samples. These tests assert the native decoder (a) returns the same
samples with and without a SEEKTABLE, (b) matches a full decode slice at any
offset, and (c) decodes only O(window) samples for a late window (via the
decode-stats ABI).
"""

import numpy as np
import pytest

from edm_tts_tpu.data.native_flac import flac_read, flac_read_stats
from flac_encoder import encode_flac

SR = 16000
BLOCK = 256


def _make_file(tmp_path, name, n_samples, seek_every=None, nch=1):
    rng = np.random.default_rng(hash(name) % 2**32)
    pcm = (rng.integers(-2000, 2000, (nch, n_samples))).astype(np.int64)
    # smooth so fixed-predictor residuals stay small
    pcm = np.cumsum(pcm, axis=1) % 8192 - 4096
    data = encode_flac(pcm, sample_rate=SR, blocksize=BLOCK,
                       subframe_kind="fixed", seek_every_frames=seek_every)
    path = tmp_path / name
    path.write_bytes(data)
    return str(path), pcm


@pytest.mark.parametrize("seek_every", [None, 8])
def test_windowed_decode_matches_full(tmp_path, seek_every):
    path, pcm = _make_file(tmp_path, f"seek_{seek_every}.flac", 40 * BLOCK,
                           seek_every=seek_every)
    full, sr = flac_read(path)
    assert sr == SR
    ref = (pcm / 32768.0).astype(np.float32)
    np.testing.assert_allclose(full, ref, atol=1e-7)
    for offset, n in [(0, 512), (1000, 777), (5 * BLOCK, 3 * BLOCK),
                      (33 * BLOCK + 17, 999), (39 * BLOCK, 2 * BLOCK)]:
        win, _ = flac_read(path, frame_offset=offset, num_frames=n)
        np.testing.assert_array_equal(win, full[:, offset : offset + n])


def test_seektable_bounds_decoded_work(tmp_path):
    """A late window of a long file decodes O(window), not O(file)."""
    n = 2000 * BLOCK  # 512k samples, 32 s @ 16 kHz
    path, _ = _make_file(tmp_path, "long_st.flac", n, seek_every=16)
    offset = n - 10 * BLOCK
    win, _, frames, samples = flac_read_stats(path, offset, 4 * BLOCK)
    assert win.shape[-1] == 4 * BLOCK
    # seek granularity is 16 frames; the window spans <= 15 frames, so decode
    # work is bounded by granularity + window + 1, far below the 2000 frames
    # a sequential decode would touch
    assert frames <= 16 + 15 + 1
    assert samples <= (16 + 15 + 1) * BLOCK


def test_binary_search_bounds_decoded_work(tmp_path):
    """Without a SEEKTABLE the header binary search still bounds the work:
    the search converges to a 64 KiB byte window before sequential decode."""
    n = 2000 * BLOCK
    path, _ = _make_file(tmp_path, "long_bs.flac", n, seek_every=None)
    offset = n - 10 * BLOCK
    win, _, frames, samples = flac_read_stats(path, offset, 4 * BLOCK)
    assert win.shape[-1] == 4 * BLOCK
    # 64 KiB of compressed data at >= ~1.2 bytes/sample (16-bit smooth pcm)
    # is well under 300 frames of pre-roll here; assert we decoded a small
    # fraction of the 2000-frame file
    assert frames < 400
    assert samples < 400 * BLOCK


def test_stereo_seek(tmp_path):
    path, pcm = _make_file(tmp_path, "stereo.flac", 64 * BLOCK,
                           seek_every=4, nch=2)
    full, _ = flac_read(path)
    offset = 50 * BLOCK + 100
    win, _ = flac_read(path, frame_offset=offset, num_frames=BLOCK)
    np.testing.assert_array_equal(win, full[:, offset : offset + BLOCK])
