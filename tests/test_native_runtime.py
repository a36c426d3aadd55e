"""C++ host audio runtime vs NumPy reference (built via make -C runtime)."""

import io
import subprocess
import os

import numpy as np
import pytest

from conformer_tpu.data import audio, native
from conformer_tpu.ops import fbank as fbank_ops

pytestmark = pytest.mark.skipif(
    not native.native_available()
    and subprocess.call(["make", "-C", os.path.join(os.path.dirname(__file__), "..", "runtime")],
                        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL) != 0,
    reason="native runtime not built and no toolchain",
)


def _tone(freq=600.0, secs=0.6, sr=16000):
    t = np.arange(int(sr * secs)) / sr
    return (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_native_loads():
    native._load.cache_clear()
    assert native.native_available()


def test_decode_wav_matches_python(tmp_path):
    wav = _tone()
    p = str(tmp_path / "t.wav")
    audio.save_wav(p, wav, 16000)
    with open(p, "rb") as f:
        data = f.read()
    out, sr = native.decode_wav(data)
    ref, ref_sr = audio.load_audio(p)
    assert sr == ref_sr == 16000
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_decode_wav_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_wav(b"not a wav file at all")


def test_native_resample_close_to_scipy():
    wav = _tone(440.0, 0.5)
    ours = native.resample(wav, 16000, 8000)
    ref = audio.resample(wav, 16000, 8000)
    n = min(len(ours), len(ref))
    # ignore edges (different filter tails)
    sl = slice(200, n - 200)
    err = np.abs(ours[sl] - ref[sl])
    assert np.percentile(err, 99) < 5e-3, np.percentile(err, 99)


def test_native_fbank_matches_numpy():
    wav = _tone() * (1 << 15)
    ours = native.fbank(wav)
    ref = fbank_ops.fbank_numpy(wav, dither=0.0)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=0.15)


def test_native_fbank_batch_threads():
    waves = [_tone(f) * (1 << 15) for f in (300.0, 900.0, 2000.0)]
    outs = native.fbank_batch(waves, num_threads=2)
    for w, o in zip(waves, outs):
        ref = fbank_ops.fbank_numpy(w, dither=0.0)
        assert o.shape == ref.shape
        np.testing.assert_allclose(o, ref, rtol=1e-3, atol=0.15)


def test_native_fbank_dither_deterministic_and_effective():
    """dither>0: reproducible in `seed`, different across seeds, raises the
    energy floor of silence (what dither is for), and stays close to the
    dither-free features on loud content."""
    wav = _tone() * (1 << 15)
    a = native.fbank(wav, dither=0.1, seed=42)
    b = native.fbank(wav, dither=0.1, seed=42)
    c = native.fbank(wav, dither=0.1, seed=43)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0
    # silence: log-energy floor must rise with dither
    silence = np.zeros(16000, np.float32)
    quiet = native.fbank(silence, dither=0.0)
    dithered = native.fbank(silence, dither=1.0, seed=7)
    assert dithered.mean() > quiet.mean() + 1.0
    # bins with real signal energy: dither 0.1 is a tiny perturbation there
    # (near-silent bins legitimately jump — that is what dither is for)
    clean = native.fbank(wav, dither=0.0)
    strong = clean > 5.0
    assert strong.any()
    assert np.abs(a - clean)[strong].mean() < 0.05


def test_native_fbank_batch_dither_thread_invariant():
    """The counter-based per-utterance seeds make the batch output identical
    for 1 vs 4 worker threads."""
    waves = [_tone(f) * (1 << 15) for f in (300.0, 900.0, 2000.0, 500.0)]
    one = native.fbank_batch(waves, num_threads=1, dither=0.1, seed=5)
    four = native.fbank_batch(waves, num_threads=4, dither=0.1, seed=5)
    for x, y in zip(one, four):
        np.testing.assert_array_equal(x, y)
