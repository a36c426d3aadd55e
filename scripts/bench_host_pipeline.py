"""Host data-pipeline throughput: audio-s/s of fully-processed, bucketed,
padded batches from real wavs (VERDICT r3 next #3).

Measures the full training pipeline — wav decode -> tokenize -> filter ->
resample -> speed perturb -> fbank(dither 0.1) -> spec_aug -> shuffle ->
sort -> bucket_batch -> padding — over the reference's shipped recordings
(samples/*.wav) looped to a target duration, with the C++ runtime on and
off, and with/without the prefetch thread overlapping a simulated device
consumer. Compare the resulting audio-s/s against the device's training
appetite (BENCH train_audio_seconds_per_sec_per_chip, ~1.6 k audio-s/s at
Conformer-M on one v5e chip).

Usage: python scripts/bench_host_pipeline.py [--target-audio-s 600]
CPU-only; safe to run while the TPU is busy (set JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SAMPLES = "/root/reference/samples"
VOCAB = "/root/reference/vocab.txt"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target-audio-s", type=float, default=600.0)
    ap.add_argument("--json", action="store_true", help="print one JSON line")
    args = ap.parse_args()

    from conformer_tpu.data import native
    from conformer_tpu.data.audio import load_audio
    from conformer_tpu.data.dataset import AsrDataset
    from conformer_tpu.data.prefetch import Prefetcher
    from conformer_tpu.config import DataConfig

    wavs = sorted(glob.glob(os.path.join(SAMPLES, "*.wav")))
    if not wavs or not os.path.exists(VOCAB):
        print(json.dumps({"error": "reference samples/vocab not available"}))
        return

    durs = [len(load_audio(w)[0]) / 16000.0 for w in wavs]
    per_loop = sum(durs)
    loops = max(int(args.target_audio_s / per_loop), 1)

    with tempfile.TemporaryDirectory() as td:
        lst = os.path.join(td, "data.list")
        with open(lst, "w") as f:
            n = 0
            for loop in range(loops):
                for w in wavs:
                    f.write(json.dumps({
                        "key": f"utt{n}",
                        "wav_path": w,
                        "transcript": "THE QUICK BROWN FOX JUMPS OVER "
                                      "THE LAZY DOG " * 3,
                    }) + "\n")
                    n += 1

        def run(native_on: bool, prefetch: bool, consumer_s: float = 0.0):
            # native off: hide the library behind a flag the loader honors
            import conformer_tpu.data.native as nat

            old = nat._load
            if not native_on:
                nat._load.cache_clear()
                nat._load = lambda: None  # type: ignore[assignment]
            try:
                cfg = DataConfig(
                    train_data_list_path=lst,
                    vocab_path=VOCAB,
                    dither=0.1,
                    shuffle_size=256,
                    sort_size=128,
                    batch_type="bucket",
                    max_frames_in_batch=8000,
                )
                ds = AsrDataset(cfg, mode="train", shard_id=0, num_shards=1)
                ds.set_epoch(0)
                stream = iter(ds)
                if prefetch:
                    stream = Prefetcher(stream, depth=4)
                audio_s = 0.0
                t0 = time.perf_counter()
                for batch in stream:
                    audio_s += float(batch["feat_lengths"].sum()) / 100.0
                    if consumer_s:
                        time.sleep(consumer_s)  # simulated device step
                dt = time.perf_counter() - t0
                return audio_s, dt
            finally:
                if not native_on:
                    nat._load = old
                    nat._load.cache_clear()

        results = {}
        for name, (nat_on, pf) in {
            "numpy_inline": (False, False),
            "native_inline": (True, False),
            "native_prefetch": (True, True),
        }.items():
            audio_s, dt = run(nat_on, pf)
            results[name] = round(audio_s / dt, 1)
            print(f"# {name}: {audio_s:.0f} audio-s in {dt:.2f}s "
                  f"-> {audio_s / dt:.1f} audio-s/s", file=sys.stderr)

        # overlap check: consumer sleeping 223 ms per ~240 audio-s batch
        # (the Conformer-M b=24 device step) should cost ~nothing extra
        audio_s, dt = run(True, True, consumer_s=0.05)
        results["native_prefetch_with_consumer"] = round(audio_s / dt, 1)
        print(f"# native_prefetch_with_consumer: {audio_s / dt:.1f} "
              f"audio-s/s", file=sys.stderr)

    out = {
        "metric": "host_pipeline_audio_seconds_per_sec",
        "device_demand_audio_s_per_s_conformer_m_b24": 1612.0,
        **results,
        "cpu_count": os.cpu_count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
