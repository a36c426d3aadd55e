"""fbank frontend: NumPy vs JAX equality + Kaldi-semantics invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from conformer_tpu.ops import fbank


def _tone(freq=1000.0, sr=16000, secs=0.3, amp=0.5):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * freq * t) * (1 << 15)).astype(np.float32)


def test_frame_count_snip_edges():
    ws, shift, padded = fbank.frame_params(16000, 25.0, 10.0)
    assert (ws, shift, padded) == (400, 160, 512)
    assert fbank.num_frames(4800, ws, shift) == 1 + (4800 - 400) // 160
    assert fbank.num_frames(399, ws, shift) == 0


def test_numpy_jax_agree():
    wav = _tone()
    a = fbank.fbank_numpy(wav, dither=0.0)
    b = np.asarray(fbank.fbank_jax(jnp.asarray(wav), dither=0.0))
    assert a.shape == b.shape
    # both fp32; FFT implementation differences show up on low-energy bins
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-2)


def test_tone_peaks_at_expected_mel_bin():
    wav = _tone(freq=1000.0)
    feat = fbank.fbank_numpy(wav, dither=0.0)
    banks = fbank.mel_banks(80, 512, 16000.0)
    fft_freqs = (16000.0 / 512) * np.arange(256)
    # mel bin whose filter center is nearest 1 kHz
    centers = (banks * fft_freqs).sum(1) / np.maximum(banks.sum(1), 1e-9)
    expect = int(np.argmin(np.abs(centers - 1000.0)))
    got = int(np.argmax(feat.mean(0)))
    assert abs(got - expect) <= 1, (got, expect)


def test_dither_zero_is_deterministic():
    wav = _tone(freq=440.0)
    a = fbank.fbank_numpy(wav, dither=0.0)
    b = fbank.fbank_numpy(wav, dither=0.0)
    np.testing.assert_array_equal(a, b)


def test_mel_banks_partition():
    banks = fbank.mel_banks(80, 512, 16000.0)
    assert banks.shape == (80, 256)
    assert (banks >= 0).all()
    # Filters tile the 20Hz..nyquist band: every fft bin in-band has weight.
    fft_freqs = (16000.0 / 512) * np.arange(256)
    in_band = (fft_freqs > 120) & (fft_freqs < 7600)
    assert (banks.sum(0)[in_band] > 0).all()


def test_batched_jax_fbank():
    wavs = np.stack([_tone(500.0), _tone(2000.0)])
    out = np.asarray(fbank.fbank_jax(jnp.asarray(wavs), dither=0.0))
    assert out.shape[0] == 2
    ref0 = fbank.fbank_numpy(wavs[0], dither=0.0)
    np.testing.assert_allclose(out[0], ref0, rtol=1e-3, atol=2e-2)


def test_mfcc_shapes():
    wav = _tone()
    feat = fbank.mfcc_numpy(wav, num_mel_bins=23, num_ceps=13, dither=0.0)
    assert feat.shape[1] == 13
    assert np.isfinite(feat).all()
