"""Audio IO + resampling + speed perturbation (host-side, NumPy).

Native-dependency equivalents (SURVEY.md §2.3): torchaudio.load -> stdlib
wave / scipy.io.wavfile (FLAC gated on soundfile); sox resample/speed ->
scipy.signal.resample_poly (polyphase). Audio is float32 in [-1, 1] like
torchaudio.load; fbank callers scale by 2**15 (processor stage).
"""

from __future__ import annotations

import wave
from fractions import Fraction

import numpy as np

try:  # optional
    import soundfile as _sf
except Exception:  # pragma: no cover - not in this image
    _sf = None

from scipy.io import wavfile as _scipy_wav
from scipy.signal import resample_poly


def load_audio(path: str) -> tuple[np.ndarray, int]:
    """Load an audio file -> (waveform float32 [-1,1] shape [N], sample_rate).

    Multi-channel audio is averaged to mono (torchaudio.load returns [C, N];
    the reference pipeline uses row 0 implicitly via kaldi fbank which
    expects [1, N] — we keep mono throughout).
    """
    if path.lower().endswith(".wav"):
        from . import native

        if native.native_available():
            with open(path, "rb") as f:
                try:
                    return native.decode_wav(f.read())
                except ValueError:
                    pass  # unusual header: fall through to python parsers
        return _load_wav(path)
    if _sf is not None:
        data, sr = _sf.read(path, dtype="float32", always_2d=True)
        return data.mean(axis=1).astype(np.float32), int(sr)
    raise RuntimeError(
        f"cannot load {path!r}: soundfile unavailable and format is not wav"
    )


def _load_wav(path: str) -> tuple[np.ndarray, int]:
    try:
        sr, data = _scipy_wav.read(path)
        if data.dtype == np.int16:
            wavf = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            wavf = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            wavf = (data.astype(np.float32) - 128.0) / 128.0
        else:
            wavf = data.astype(np.float32)
        if wavf.ndim == 2:
            wavf = wavf.mean(axis=1)
        return wavf.astype(np.float32), int(sr)
    except Exception:
        # fall back to the stdlib parser (handles some nonstandard headers)
        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            raw = w.readframes(n)
        if width == 2:
            data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        elif width == 1:
            data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise RuntimeError(f"unsupported wav sample width {width}")
        ch = 1
        try:
            ch = w.getnchannels()  # type: ignore[union-attr]
        except Exception:
            pass
        if ch > 1:
            data = data.reshape(-1, ch).mean(axis=1)
        return data.astype(np.float32), int(sr)


def save_wav(path: str, waveform: np.ndarray, sample_rate: int) -> None:
    """Write mono float32 [-1,1] to 16-bit PCM wav."""
    pcm = np.clip(waveform, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    _scipy_wav.write(path, sample_rate, pcm)


def resample(waveform: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase resampling (reference: torchaudio.transforms.Resample,
    src/processor.py:49-59)."""
    if orig_sr == new_sr:
        return waveform
    frac = Fraction(new_sr, orig_sr)
    out = resample_poly(waveform.astype(np.float64), frac.numerator, frac.denominator)
    return out.astype(np.float32)


def speed_perturb(waveform: np.ndarray, sample_rate: int, speed: float) -> np.ndarray:
    """sox-style `speed` effect (tempo+pitch): resample by 1/speed then
    reinterpret at the original rate (reference src/processor.py:62-77)."""
    if speed == 1.0:
        return waveform
    frac = Fraction(speed).limit_denominator(100)
    out = resample_poly(
        waveform.astype(np.float64), frac.denominator, frac.numerator
    )
    return out.astype(np.float32)
