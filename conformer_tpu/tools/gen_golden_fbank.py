"""Generate Kaldi golden fbank/mfcc fixtures (run OFF-IMAGE, needs torchaudio).

This image has no torchaudio and no package egress (pip install torchaudio
-> "no matching distribution", recorded in docs/ROADMAP.md), so the ground
truth the reference uses (`torchaudio.compliance.kaldi.fbank`,
/root/reference/src/processor.py:185-191) cannot be produced here. Run this
script once on any machine with torchaudio, commit the resulting
`tests/fixtures/fbank_golden.npz`, and `tests/test_fbank_golden.py` will
assert every in-repo implementation (NumPy / JAX / Pallas / C++ runtime)
against it.

The input signals are generated deterministically below (no wav files
needed): numpy legacy RandomState is bit-stable across numpy versions, so
the fixture generated off-image corresponds exactly to the signals the test
regenerates in-image.

Usage (off-image):
    python -m conformer_tpu.tools.gen_golden_fbank \
        --out tests/fixtures/fbank_golden.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def golden_signals(sample_rate: int = 16000) -> dict[str, np.ndarray]:
    """Deterministic test signals, already scaled x 2**15 (Kaldi convention,
    reference src/processor.py:181). Regenerated identically in the test."""
    t = np.arange(int(0.45 * sample_rate), dtype=np.float64) / sample_rate
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    chirp = 0.4 * np.sin(2 * np.pi * (200.0 + 4000.0 * t) * t)
    noise = 0.1 * np.random.RandomState(1234).standard_normal(len(t))
    return {
        "tone": (tone * (1 << 15)).astype(np.float32),
        "chirp": (chirp * (1 << 15)).astype(np.float32),
        "mix": ((tone + chirp + noise) * (1 << 15)).astype(np.float32),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/fbank_golden.npz")
    args = ap.parse_args()

    import torch
    import torchaudio.compliance.kaldi as kaldi

    out: dict[str, np.ndarray] = {}
    for name, wav in golden_signals().items():
        wf = torch.from_numpy(wav[None, :])
        out[f"fbank_{name}"] = kaldi.fbank(
            wf, num_mel_bins=80, frame_length=25, frame_shift=10,
            dither=0.0, energy_floor=0.0, sample_frequency=16000,
        ).numpy()
        out[f"mfcc_{name}"] = kaldi.mfcc(
            wf, num_mel_bins=23, num_ceps=13, frame_length=25,
            frame_shift=10, dither=0.0, energy_floor=0.0,
            sample_frequency=16000,
        ).numpy()
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}: {sorted(out)}")


if __name__ == "__main__":
    main()
