"""Native threaded audio prefetcher (native/prefetch.cc + ctypes binding).

The data-loader-worker analog of the reference's DataLoader(num_workers=32)
(dump_tokens.py:176-179): C++ threads decode FLAC windows ahead of the
consumer, with strict submission-order delivery.
"""

import numpy as np
import pytest

from edm_tts_tpu.data.native_flac import flac_read
from edm_tts_tpu.data.native_prefetch import (
    AudioPrefetcher,
    prefetch_audio_windows,
    prefetch_manifest,
)
from tests.flac_encoder import encode_flac


@pytest.fixture(scope="module")
def flac_files(tmp_path_factory):
    """Size-skewed mono FLACs so completion order differs from submission."""
    d = tmp_path_factory.mktemp("pf")
    rng = np.random.default_rng(0)
    paths, wavs = [], []
    for i, n in enumerate([48000, 800, 24000, 1600, 12000, 3200]):
        pcm = (rng.standard_normal(n) * 4000).astype(np.int16)
        p = str(d / f"a{i}.flac")
        with open(p, "wb") as f:
            f.write(encode_flac(pcm[None], sample_rate=16000))
        paths.append(p)
        wavs.append(np.asarray(flac_read(p)[0][0]))  # decoder round-trip ref
    return paths, wavs


def test_prefetch_matches_sync_decode_in_order(flac_files):
    paths, wavs = flac_files
    windows = [(p, 0, -1) for p in paths] * 3  # 18 jobs over 4 threads
    outs = list(prefetch_audio_windows(windows, n_threads=4, max_inflight=5))
    assert len(outs) == len(windows)
    for (audio, sr), (p, _, _) in zip(outs, windows):
        ref = wavs[paths.index(p)]
        assert sr == 16000
        np.testing.assert_array_equal(audio, ref)


def test_prefetch_windows_offsets(flac_files):
    paths, wavs = flac_files
    p, ref = paths[0], wavs[0]
    outs = list(prefetch_audio_windows(
        [(p, 1000, 2000), (p, 0, 500), (p, 47000, -1)], n_threads=2,
    ))
    np.testing.assert_array_equal(outs[0][0], ref[1000:3000])
    np.testing.assert_array_equal(outs[1][0], ref[:500])
    np.testing.assert_array_equal(outs[2][0], ref[47000:])


def test_prefetcher_error_on_missing_file(tmp_path):
    with AudioPrefetcher(n_threads=1) as pf:
        pf.submit(str(tmp_path / "nope.flac"))
        with pytest.raises(RuntimeError):
            pf.next()


def test_prefetch_manifest_attaches_audio(flac_files):
    paths, wavs = flac_files
    manifest = [
        {"id": f"x{i}", "file": p, "offset": 0, "num_frames": -1}
        for i, p in enumerate(paths)
    ]
    out = list(prefetch_manifest(iter(manifest), n_threads=3, max_inflight=2))
    assert [ex["id"] for ex in out] == [ex["id"] for ex in manifest]
    for ex, ref in zip(out, wavs):
        np.testing.assert_array_equal(ex["_audio"], ref)
        assert ex["_sr"] == 16000
    # the originals are not mutated
    assert "_audio" not in manifest[0]


def test_pipeline_uses_prefetched_audio(flac_files):
    from edm_tts_tpu.data.pipeline import load_audio_segments

    paths, wavs = flac_files
    ex = {"id": "y", "file": paths[2], "offset": 0, "num_frames": -1}
    sync = list(load_audio_segments(ex, 16000, None))[0]["audio"]
    pre = list(prefetch_manifest(iter([ex]), n_threads=1))[0]
    fetched = list(load_audio_segments(pre, 16000, None))[0]["audio"]
    np.testing.assert_array_equal(fetched, sync)
