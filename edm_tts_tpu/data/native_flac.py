"""ctypes binding for the first-party native FLAC decoder (native/flac.cc).

Builds the shared library on first use (g++; one translation unit, ~1 s).
API mirrors the torchaudio.load/info calls the reference relies on
(frame_offset / num_frames windows, header-only probing).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from edm_tts_tpu.data.audio_io import AudioInfo

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libedmflac.so"))
_lock = threading.Lock()
_lib = None


class _FlacInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_uint32),
        ("channels", ctypes.c_uint32),
        ("bits_per_sample", ctypes.c_uint32),
        ("total_samples", ctypes.c_uint64),
    ]


def _load_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        d = os.path.dirname(_LIB_PATH)
        srcs = [os.path.join(d, "flac.cc"), os.path.join(d, "prefetch.cc")]
        stale = not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
            for src in srcs
        )
        if stale:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o",
                 _LIB_PATH, *srcs, "-lpthread"],
                check=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.edmflac_info.restype = ctypes.c_int
        lib.edmflac_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(_FlacInfo),
        ]
        lib.edmflac_decode.restype = ctypes.c_int64
        lib.edmflac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.edmflac_decode_stats.restype = ctypes.c_int64
        lib.edmflac_decode_stats.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return lib


def flac_info(path: str) -> AudioInfo:
    lib = _load_lib()
    with open(path, "rb") as f:
        data = f.read(65536)  # metadata fits in the head of the file
    info = _FlacInfo()
    rc = lib.edmflac_info(data, len(data), ctypes.byref(info))
    if rc != 0:
        # metadata larger than 64k (e.g. big seektables/pictures): read all
        with open(path, "rb") as f:
            data = f.read()
        rc = lib.edmflac_info(data, len(data), ctypes.byref(info))
        if rc != 0:
            raise ValueError(f"not a FLAC file: {path}")
    return AudioInfo(info.sample_rate, int(info.total_samples), info.channels)


def flac_read(
    path: str, frame_offset: int = 0, num_frames: int = -1
) -> tuple[np.ndarray, int]:
    """Decode a window; returns ((C, T) float32 in [-1, 1], sample_rate)."""
    lib = _load_lib()
    with open(path, "rb") as f:
        data = f.read()
    info = _FlacInfo()
    if lib.edmflac_info(data, len(data), ctypes.byref(info)) != 0:
        raise ValueError(f"not a FLAC file: {path}")
    total = int(info.total_samples)
    if num_frames < 0:
        num_frames = total - frame_offset
    num_frames = max(min(num_frames, total - frame_offset), 0)
    out = np.zeros(num_frames * info.channels, dtype=np.float32)
    n = lib.edmflac_decode(
        data, len(data), frame_offset, num_frames,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if n < 0:
        raise ValueError(f"FLAC decode error: {path}")
    audio = out[: n * info.channels].reshape(-1, info.channels).T
    return np.ascontiguousarray(audio), int(info.sample_rate)


def flac_read_stats(
    path: str, frame_offset: int = 0, num_frames: int = -1
) -> tuple[np.ndarray, int, int, int]:
    """Like ``flac_read`` but also reports (frames, samples) actually decoded
    — with seeking (SEEKTABLE or header binary search, native/flac.cc) a late
    window decodes O(window) samples, not O(file)."""
    lib = _load_lib()
    with open(path, "rb") as f:
        data = f.read()
    info = _FlacInfo()
    if lib.edmflac_info(data, len(data), ctypes.byref(info)) != 0:
        raise ValueError(f"not a FLAC file: {path}")
    total = int(info.total_samples)
    if num_frames < 0:
        num_frames = total - frame_offset
    num_frames = max(min(num_frames, total - frame_offset), 0)
    out = np.zeros(num_frames * info.channels, dtype=np.float32)
    frames = ctypes.c_int64(0)
    samples = ctypes.c_int64(0)
    n = lib.edmflac_decode_stats(
        data, len(data), frame_offset, num_frames,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(frames), ctypes.byref(samples),
    )
    if n < 0:
        raise ValueError(f"FLAC decode error: {path}")
    audio = out[: n * info.channels].reshape(-1, info.channels).T
    return (np.ascontiguousarray(audio), int(info.sample_rate),
            int(frames.value), int(samples.value))
