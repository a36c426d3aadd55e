"""Pallas fbank kernel vs the pure-JAX/NumPy reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from conformer_tpu.ops import fbank
from conformer_tpu.ops.pallas.fbank_kernel import fbank_pallas


def _tones():
    t = np.arange(8000) / 16000.0
    w1 = 0.4 * np.sin(2 * np.pi * 700 * t)
    w2 = 0.2 * np.sin(2 * np.pi * 2500 * t)
    return (np.stack([w1, w2]) * (1 << 15)).astype(np.float32)


def test_pallas_fbank_matches_reference():
    wavs = _tones()
    ref = np.stack([fbank.fbank_numpy(w, dither=0.0) for w in wavs])
    got = np.asarray(
        fbank_pallas(jnp.asarray(wavs), dither=0.0, interpret=True)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=0.15)


def test_pallas_fbank_nondivisible_frames():
    wav = _tones()[:1, :7000]  # 42 frames, not a multiple of the 16-tile
    ref = fbank.fbank_numpy(wav[0], dither=0.0)
    got = np.asarray(fbank_pallas(jnp.asarray(wav), dither=0.0, interpret=True))
    assert got.shape[1] == ref.shape[0]
    np.testing.assert_allclose(got[0], ref, rtol=1e-3, atol=0.15)


def test_pallas_fbank_dither_statistics():
    import jax
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("pltpu.prng_* has no CPU interpret lowering")
    wav = _tones()[:1]
    a = np.asarray(fbank_pallas(jnp.asarray(wav), dither=1.0, seed=1, interpret=True))
    b = np.asarray(fbank_pallas(jnp.asarray(wav), dither=1.0, seed=2, interpret=True))
    clean = np.asarray(fbank_pallas(jnp.asarray(wav), dither=0.0, interpret=True))
    # different seeds differ; dithered stays close to clean on loud bins
    assert not np.allclose(a, b)
    loud = clean > clean.mean()
    np.testing.assert_allclose(a[loud], clean[loud], atol=0.5)
