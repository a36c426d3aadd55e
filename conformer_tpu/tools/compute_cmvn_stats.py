"""Global CMVN statistics over a data.list.

Rebuilds /root/reference/utils/compute_cmvn_stats.py:18-139 (a DataLoader
map-reduce of per-wav fbank sums / squared sums) as a multiprocessing
map-reduce over our NumPy fbank. Output JSON {mean_stat, var_stat,
frame_num} matches the reference loader (src/utils.py:7-28).

Usage:
    python -m conformer_tpu.tools.compute_cmvn_stats \
        --data_list data/train-960/data.list --output data/train-960/global_cmvn
"""

from __future__ import annotations

import argparse
import json
from multiprocessing import Pool

import numpy as np

from ..data.audio import load_audio, resample
from ..ops.fbank import fbank_numpy


def _stats_for(args: tuple[str, int, int]) -> tuple[np.ndarray, np.ndarray, int]:
    path, num_mel_bins, sr = args
    wav, orig_sr = load_audio(path)
    if orig_sr != sr:
        wav = resample(wav, orig_sr, sr)
    feat = fbank_numpy(
        wav * (1 << 15), sample_rate=sr, num_mel_bins=num_mel_bins, dither=0.0
    ).astype(np.float64)
    return feat.sum(0), (feat**2).sum(0), feat.shape[0]


def compute(
    data_list: str,
    output: str,
    num_mel_bins: int = 80,
    sample_rate: int = 16000,
    num_workers: int = 2,
) -> dict:
    paths = []
    with open(data_list) as f:
        for line in f:
            line = line.strip()
            if line:
                paths.append(json.loads(line)["wav_path"])

    mean_stat = np.zeros(num_mel_bins)
    var_stat = np.zeros(num_mel_bins)
    frames = 0
    jobs = [(p, num_mel_bins, sample_rate) for p in paths]
    if num_workers > 1:
        with Pool(num_workers) as pool:
            for m, v, n in pool.imap_unordered(_stats_for, jobs, chunksize=16):
                mean_stat += m
                var_stat += v
                frames += n
    else:
        for job in jobs:
            m, v, n = _stats_for(job)
            mean_stat += m
            var_stat += v
            frames += n

    stats = {
        "mean_stat": mean_stat.tolist(),
        "var_stat": var_stat.tolist(),
        "frame_num": frames,
    }
    with open(output, "w") as f:
        json.dump(stats, f)
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_list", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--num_mel_bins", type=int, default=80)
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--num_workers", type=int, default=2)
    args = ap.parse_args()
    stats = compute(
        args.data_list, args.output, args.num_mel_bins, args.sample_rate,
        args.num_workers,
    )
    print(f"frames: {stats['frame_num']} -> {args.output}")


if __name__ == "__main__":
    main()
