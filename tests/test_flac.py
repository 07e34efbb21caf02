"""Native FLAC decoder tests: lossless round-trip against the pure-python
test-vector encoder across every subframe type and stereo mode."""

import numpy as np
import pytest

from tests.flac_encoder import encode_flac


@pytest.fixture(scope="module")
def lib():
    from edm_tts_tpu.data import native_flac

    native_flac._load_lib()
    return native_flac


def _roundtrip(lib, channels, tmp_path, name, **kw):
    data = encode_flac(np.asarray(channels), **kw)
    path = tmp_path / f"{name}.flac"
    path.write_bytes(data)
    audio, sr = lib.flac_read(str(path))
    ints = np.round(audio * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(ints, np.asarray(channels))
    return sr


def _rand(rng, shape, lo=-2000, hi=2000):
    return rng.integers(lo, hi, size=shape, dtype=np.int64)


def test_info(lib, tmp_path, rng):
    x = _rand(rng, (1, 3000))
    path = tmp_path / "info.flac"
    path.write_bytes(encode_flac(x, sample_rate=22050, subframe_kind="verbatim"))
    info = lib.flac_info(str(path))
    assert info.sample_rate == 22050
    assert info.num_frames == 3000
    assert info.num_channels == 1


@pytest.mark.parametrize("kind,kw", [
    ("verbatim", {}),
    ("fixed", {"order": 0, "param": 12}),
    ("fixed", {"order": 1, "param": 11}),
    ("fixed", {"order": 2, "param": 10}),
    ("fixed", {"order": 3, "param": 12}),
    ("fixed", {"order": 4, "param": 13}),
    ("fixed", {"order": 2, "param": 10, "rice2": True}),
    ("fixed", {"order": 2, "escape": True}),
    ("lpc", {"order": 2, "coefs": [3000, -1200], "shift": 11, "precision": 14,
             "param": 11}),
    ("lpc", {"order": 4, "coefs": [1500, 700, -300, 100], "shift": 10,
             "precision": 14, "param": 12}),
])
def test_mono_roundtrip(lib, tmp_path, rng, kind, kw):
    x = _rand(rng, (1, 2500))
    _roundtrip(lib, x, tmp_path, f"mono_{kind}_{len(kw)}",
               subframe_kind=kind, **kw)


def test_constant_subframe(lib, tmp_path):
    x = np.full((1, 2048), -123, dtype=np.int64)
    _roundtrip(lib, x, tmp_path, "const", subframe_kind="constant")


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side"])
def test_stereo_modes(lib, tmp_path, rng, mode):
    x = _rand(rng, (2, 3000))
    _roundtrip(lib, x, tmp_path, f"stereo_{mode}",
               subframe_kind="fixed", order=2, param=11, stereo_mode=mode)


def test_windowed_read(lib, tmp_path, rng):
    x = _rand(rng, (1, 5000))
    path = tmp_path / "win.flac"
    path.write_bytes(encode_flac(x, subframe_kind="fixed", order=1, param=11,
                                 blocksize=512))
    audio, sr = lib.flac_read(str(path), frame_offset=700, num_frames=1234)
    ints = np.round(audio * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(ints[0], x[0, 700:1934])
    # tail-clamped window
    audio2, _ = lib.flac_read(str(path), frame_offset=4800, num_frames=1000)
    assert audio2.shape[1] == 200


def test_multi_frame_boundaries(lib, tmp_path, rng):
    """Blocksize not dividing length: last frame shorter."""
    x = _rand(rng, (1, 2500))
    _roundtrip(lib, x, tmp_path, "frames", subframe_kind="fixed", order=2,
               param=11, blocksize=777)


def test_audio_io_dispatch(lib, tmp_path, rng):
    from edm_tts_tpu.data.audio_io import audio_info, load_audio

    x = _rand(rng, (1, 2000))
    path = tmp_path / "dispatch.flac"
    path.write_bytes(encode_flac(x, subframe_kind="fixed", order=2, param=11))
    info = audio_info(str(path))
    assert info.num_frames == 2000
    audio, sr = load_audio(str(path), 100, 500)
    assert audio.shape == (1, 500)
    np.testing.assert_array_equal(
        np.round(audio[0] * 32768.0).astype(np.int64), x[0, 100:600]
    )
