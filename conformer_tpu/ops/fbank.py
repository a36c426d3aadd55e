"""Kaldi-compatible log-mel fbank / MFCC — NumPy (host pipeline) and JAX
(device, batched) implementations.

TPU-native equivalent of torchaudio.compliance.kaldi.fbank/mfcc as used by
the reference (src/processor.py:185-193, 208-216; src/deploy.py:112-118).
Semantics follow Kaldi's compute-fbank-feats with the reference's settings:
  - waveform pre-scaled by 2**15 by the CALLER (processor.py:181),
  - snip_edges=True framing: frames[i] = wave[i*shift : i*shift+window],
  - optional dither (Gaussian, stddev = `dither`),
  - remove_dc_offset=True (per-frame mean subtraction),
  - preemphasis 0.97 with first-sample replication at the frame edge,
  - povey window (hann**0.85),
  - FFT at next power of two, power spectrum,
  - mel filterbank (num_bins triangles, low 20 Hz, high nyquist; Kaldi mel
    scale 1127*ln(1+f/700)), log with float32-epsilon floor,
  - use_energy=False (fbank), energy_floor=0.

The JAX path batches over frames/utterances and is the basis for the fused
Pallas STFT/mel kernel (ops/pallas/fbank_kernel.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_EPSILON = 1.1920928955078125e-07  # float32 machine epsilon (Kaldi EPSILON)
_MILLISECONDS_TO_SECONDS = 0.001


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def frame_params(sample_rate: float, frame_length_ms: float, frame_shift_ms: float):
    window_size = int(sample_rate * frame_length_ms * _MILLISECONDS_TO_SECONDS)
    window_shift = int(sample_rate * frame_shift_ms * _MILLISECONDS_TO_SECONDS)
    return window_size, window_shift, _next_pow2(window_size)


def num_frames(num_samples: int, window_size: int, window_shift: int) -> int:
    """snip_edges=True frame count."""
    if num_samples < window_size:
        return 0
    return 1 + (num_samples - window_size) // window_shift


def povey_window(window_size: int) -> np.ndarray:
    n = np.arange(window_size, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2 * math.pi * n / (window_size - 1))
    return (hann ** 0.85).astype(np.float64)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks(
    num_bins: int,
    window_length_padded: int,
    sample_rate: float,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-style triangular mel filterbank: [num_bins, num_fft_bins].

    num_fft_bins = window_length_padded // 2 (the nyquist bin is dropped,
    as torchaudio's get_mel_banks does).
    """
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    assert 0.0 <= low_freq < high_freq <= nyquist

    fft_bin_width = sample_rate / window_length_padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_bins, num_fft_bins), np.float64)
    fft_freqs = fft_bin_width * np.arange(num_fft_bins)
    mel_freqs = mel_scale(fft_freqs)
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        bins[b] = np.maximum(0.0, np.minimum(up, down))
    return bins


# ----------------------------------------------------------------- NumPy path


def fbank_numpy(
    waveform: np.ndarray,
    sample_rate: float = 16000.0,
    num_mel_bins: int = 80,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    dither: float = 0.0,
    preemphasis_coefficient: float = 0.97,
    remove_dc_offset: bool = True,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Host-side log-mel fbank: waveform [N] (already x 2**15) -> [T, M] fp32.

    Computed in float32 like Kaldi / torchaudio.compliance.kaldi (and like
    the JAX device path, so the two agree closely)."""
    waveform = np.asarray(waveform, np.float32).reshape(-1)
    ws, shift, padded = frame_params(sample_rate, frame_length, frame_shift)
    t = num_frames(len(waveform), ws, shift)
    if t == 0:
        return np.zeros((0, num_mel_bins), np.float32)

    idx = np.arange(ws)[None, :] + shift * np.arange(t)[:, None]
    frames = waveform[idx]

    if dither != 0.0:
        rng = rng or np.random.default_rng()
        frames = frames + (dither * rng.standard_normal(frames.shape)).astype(
            np.float32
        )
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True, dtype=np.float32)
    if preemphasis_coefficient != 0.0:
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - np.float32(preemphasis_coefficient) * prev
    frames = frames * povey_window(ws)[None, :].astype(np.float32)

    spec = np.fft.rfft(frames.astype(np.float32), n=padded, axis=1)
    power = (spec.real.astype(np.float32) ** 2 + spec.imag.astype(np.float32) ** 2)[
        :, : padded // 2
    ]

    banks = mel_banks(num_mel_bins, padded, sample_rate, low_freq, high_freq).astype(
        np.float32
    )
    mel_e = power @ banks.T
    return np.log(np.maximum(mel_e, np.float32(_EPSILON))).astype(np.float32)


def mfcc_numpy(
    waveform: np.ndarray,
    sample_rate: float = 16000.0,
    num_mel_bins: int = 23,
    num_ceps: int = 13,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    dither: float = 0.0,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    cepstral_lifter: float = 22.0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Kaldi-style MFCC (reference src/processor.py:196-218)."""
    logmel = fbank_numpy(
        waveform,
        sample_rate,
        num_mel_bins,
        frame_length,
        frame_shift,
        dither,
        low_freq=low_freq,
        high_freq=high_freq,
        rng=rng,
    ).astype(np.float64)
    # DCT-II orthonormal, keep num_ceps
    m = num_mel_bins
    k = np.arange(num_ceps)[:, None]
    n = np.arange(m)[None, :]
    dct = np.cos(math.pi * k * (2 * n + 1) / (2 * m)) * math.sqrt(2.0 / m)
    dct[0] *= 1.0 / math.sqrt(2.0)
    ceps = logmel @ dct.T
    if cepstral_lifter != 0.0:
        lift = 1.0 + 0.5 * cepstral_lifter * np.sin(
            math.pi * np.arange(num_ceps) / cepstral_lifter
        )
        ceps = ceps * lift
    return ceps.astype(np.float32)


# ------------------------------------------------------------------- JAX path


def dft_matrices(window_size: int, padded: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT as two matmuls: (cos, sin) each [window_size, padded//2].

    frames @ cos and frames @ sin give Re/Im of the zero-padded rFFT for
    bins 0..padded//2-1 (the nyquist bin is dropped by the mel banks
    anyway). On TPU this runs on the MXU and beats XLA's FFT lowering.
    """
    n = np.arange(window_size)[:, None]
    k = np.arange(padded // 2)[None, :]
    ang = 2.0 * math.pi * n * k / padded
    return np.cos(ang), -np.sin(ang)


def fbank_jax(
    waveform: jax.Array,
    *,
    sample_rate: float = 16000.0,
    num_mel_bins: int = 80,
    frame_length: float = 25.0,
    frame_shift: float = 10.0,
    dither: float = 0.0,
    rng: jax.Array | None = None,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
    use_matmul_dft: bool = True,
) -> jax.Array:
    """Device log-mel fbank: waveform [..., N] (x 2**15) -> [..., T, M] fp32.

    Batched over leading dims; jit-friendly (static N). With
    use_matmul_dft the spectrum comes from two MXU matmuls instead of
    jnp.fft.rfft (much faster on TPU); ops/pallas/fbank_kernel.py fuses the
    whole chain into one kernel.
    """
    ws, shift, padded = frame_params(sample_rate, frame_length, frame_shift)
    n = waveform.shape[-1]
    t = num_frames(n, ws, shift)
    lead = waveform.shape[:-1]
    wf = waveform.astype(jnp.float32).reshape(-1, n)

    idx = jnp.arange(ws)[None, :] + shift * jnp.arange(t)[:, None]
    frames = wf[:, idx]                                   # [B, T, ws]

    if dither != 0.0:
        assert rng is not None, "dither needs an rng key"
        frames = frames + dither * jax.random.normal(rng, frames.shape)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * prev
    frames = frames * jnp.asarray(povey_window(ws), jnp.float32)

    if use_matmul_dft:
        cos_m, sin_m = dft_matrices(ws, padded)
        re = jnp.einsum(
            "btw,wf->btf", frames, jnp.asarray(cos_m, jnp.float32),
            preferred_element_type=jnp.float32,
        )
        im = jnp.einsum(
            "btw,wf->btf", frames, jnp.asarray(sin_m, jnp.float32),
            preferred_element_type=jnp.float32,
        )
        power = re**2 + im**2
    else:
        spec = jnp.fft.rfft(frames, n=padded, axis=-1)
        power = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)[..., : padded // 2]

    banks = jnp.asarray(
        mel_banks(num_mel_bins, padded, sample_rate, low_freq, high_freq),
        jnp.float32,
    )
    mel_e = jnp.einsum("btf,mf->btm", power, banks, preferred_element_type=jnp.float32)
    out = jnp.log(jnp.maximum(mel_e, _EPSILON))
    return out.reshape(*lead, t, num_mel_bins)
