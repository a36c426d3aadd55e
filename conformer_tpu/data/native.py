"""ctypes bindings for the C++ host audio runtime (runtime/audio_runtime.cc).

Build with `make -C runtime`; all entry points fall back to the NumPy
implementations when the shared library is absent, so the framework works
without a toolchain. Use `native_available()` to check.
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "runtime", "build",
                 "libaudio_runtime.so"),
    os.environ.get("CONFORMER_TPU_AUDIO_RT", ""),
]


# ABI version this binding layer expects from the .so; must match
# crt_abi_version() in runtime/audio_runtime.cc. v2 = dither+seed args on
# crt_fbank/crt_fbank_batch. A stale build from before the bump would be
# called with the wrong register layout (seed landing in the out-pointer
# slot) — refuse it and fall back to NumPy instead.
_EXPECTED_ABI = 2


@lru_cache(maxsize=1)
def _load() -> ctypes.CDLL | None:
    for path in _LIB_PATHS:
        if path and os.path.exists(path):
            lib = ctypes.CDLL(os.path.abspath(path))
            try:
                lib.crt_abi_version.restype = ctypes.c_int32
                lib.crt_abi_version.argtypes = []
                version = lib.crt_abi_version()
            except AttributeError:
                version = 1  # pre-versioning builds exported no version symbol
            if version != _EXPECTED_ABI:
                import warnings

                warnings.warn(
                    f"libaudio_runtime.so at {path} has ABI v{version}, "
                    f"expected v{_EXPECTED_ABI}; rebuild with `make -C runtime`."
                    " Falling back to the NumPy audio path.",
                    RuntimeWarning,
                    stacklevel=2,
                )
                continue
            lib.crt_decode_wav.restype = ctypes.c_int64
            lib.crt_decode_wav.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ]
            lib.crt_resample.restype = ctypes.c_int64
            lib.crt_resample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ]
            lib.crt_fbank.restype = ctypes.c_int64
            lib.crt_fbank.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
                ctypes.c_int32, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.crt_fbank_batch.restype = None
            lib.crt_fbank_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_float,
                ctypes.c_int32, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
            ]
            return lib
    return None


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 mono [-1,1], sample_rate)."""
    lib = _load()
    assert lib is not None
    sr = ctypes.c_int32(0)
    n = lib.crt_decode_wav(data, len(data), None, ctypes.byref(sr))
    if n < 0:
        raise ValueError("native wav parse failed")
    out = np.empty(n, np.float32)
    lib.crt_decode_wav(data, len(data), _fptr(out), ctypes.byref(sr))
    return out, int(sr.value)


def resample(wave: np.ndarray, in_rate: int, out_rate: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    wave = np.ascontiguousarray(wave, np.float32)
    n = lib.crt_resample(_fptr(wave), len(wave), in_rate, out_rate, None)
    out = np.empty(n, np.float32)
    lib.crt_resample(_fptr(wave), len(wave), in_rate, out_rate, _fptr(out))
    return out


def fbank(
    wave: np.ndarray,
    sample_rate: float = 16000.0,
    num_mel_bins: int = 80,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    dither: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """wave [N] (x 2**15) -> [T, M] float32. dither>0 adds counter-based
    Gaussian noise (deterministic in `seed`), so the native path serves the
    training recipe (dither 0.1), not just eval."""
    lib = _load()
    assert lib is not None
    wave = np.ascontiguousarray(wave, np.float32)
    t = lib.crt_fbank(
        _fptr(wave), len(wave), sample_rate, num_mel_bins,
        frame_length, frame_shift, dither, seed, None,
    )
    out = np.empty((t, num_mel_bins), np.float32)
    if t:
        lib.crt_fbank(
            _fptr(wave), len(wave), sample_rate, num_mel_bins,
            frame_length, frame_shift, dither, seed, _fptr(out),
        )
    return out


def fbank_batch(
    waves: list[np.ndarray],
    sample_rate: float = 16000.0,
    num_mel_bins: int = 80,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    num_threads: int = 2,
    dither: float = 0.0,
    seed: int = 0,
) -> list[np.ndarray]:
    """Multi-threaded batched fbank over a list of waveforms."""
    lib = _load()
    assert lib is not None
    ws = int(sample_rate * frame_length / 1000)
    shift = int(sample_rate * frame_shift / 1000)
    lengths = np.asarray([len(w) for w in waves], np.int64)
    offsets = np.zeros(len(waves), np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:]) if len(waves) > 1 else None
    concat = np.concatenate(
        [np.ascontiguousarray(w, np.float32) for w in waves]
    ) if waves else np.zeros(0, np.float32)
    t_frames = np.asarray(
        [max(0, 1 + (len(w) - ws) // shift) if len(w) >= ws else 0 for w in waves],
        np.int64,
    )
    out_offsets = np.zeros(len(waves), np.int64)
    if len(waves) > 1:
        np.cumsum(t_frames[:-1], out=out_offsets[1:])
    total = int(t_frames.sum())
    outs = np.empty(total * num_mel_bins, np.float32)
    lib.crt_fbank_batch(
        _fptr(concat), _iptr(offsets), _iptr(lengths), len(waves),
        sample_rate, num_mel_bins, frame_length, frame_shift,
        dither, seed,
        _fptr(outs), _iptr(out_offsets), num_threads,
    )
    result = []
    for i in range(len(waves)):
        o = int(out_offsets[i]) * num_mel_bins
        t = int(t_frames[i])
        result.append(outs[o : o + t * num_mel_bins].reshape(t, num_mel_bins))
    return result
