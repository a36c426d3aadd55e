"""Multi-host execution integration test (VERDICT.md missing #1).

Launches the real Trainer in 2 separate OS processes joined by
jax.distributed (gloo collectives on CPU) and asserts the training losses
and globally-aggregated validation WER are identical to a single-process
run over the same data — the property the reference gets from Lightning
DDP + validation all_gather (src/executor.py:137-139, src/module.py:87-96).

The global batch is assembled from per-host shards
(jax.make_array_from_process_local_data), so with a deterministic pipeline
the 2-process global batch holds the same utterances as the single-process
batch (row order permuted — the masked-mean loss is permutation
invariant).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from conformer_tpu.data import audio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    d = tmp_path_factory.mktemp("mp_ws")
    rng = np.random.default_rng(0)
    # Equal-length wavs + equal-length texts: all hosts present identical
    # batch shapes, and the fixed 64-frame bucket absorbs every utterance.
    texts = ["AB", "BA", "AA", "BB", "AB", "BA", "AA", "BB"]
    entries = []
    for i, text in enumerate(texts):
        wav = (
            0.2 * np.sin(2 * np.pi * (300 + 100 * i) * np.arange(6400) / 16000)
            + 0.01 * rng.standard_normal(6400)
        ).astype(np.float32)
        path = str(d / f"u{i}.wav")
        audio.save_wav(path, wav, 16000)
        entries.append({"key": f"u{i}", "wav_path": path, "transcript": text})
    lst = str(d / "data.list")
    with open(lst, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    vocab = str(d / "vocab.txt")
    with open(vocab, "w") as f:
        for w, i in [("<blank>", 0), ("<unk>", 1), ("A", 2), ("B", 3),
                     ("_", 4), ("<sos/eos>", 5)]:
            f.write(f"{w} {i}\n")
    return {"dir": str(d), "list": lst, "vocab": vocab}


def _run_worker(spec: dict, timeout: int = 600) -> subprocess.Popen:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO
    return subprocess.Popen(
        [sys.executable, WORKER, json.dumps(spec)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _base_spec(workspace, out_dir, pid, nproc, port, max_frames):
    return {
        "repo": REPO,
        "data_list": workspace["list"],
        "vocab": workspace["vocab"],
        "ckpt_dir": os.path.join(out_dir, f"ckpt_n{nproc}"),
        "out_path": os.path.join(out_dir, f"out_n{nproc}_p{pid}.json"),
        "coordinator": f"localhost:{port}",
        "num_processes": nproc,
        "process_id": pid,
        "local_devices": 2,
        "steps": 3,
        "max_frames_in_batch": max_frames,
    }


def test_two_process_matches_single_process(workspace, tmp_path):
    port = 46000 + os.getpid() % 1000
    out_dir = str(tmp_path)

    # Single-process reference: 4-row batches (global batch of 4 utts).
    s_spec = _base_spec(workspace, out_dir, 0, 1, port, max_frames=256)
    sp = _run_worker(s_spec)
    s_out, s_err = sp.communicate(timeout=900)
    assert sp.returncode == 0, f"single-proc worker failed:\n{s_err[-3000:]}"

    # Two processes x 2-row local batches -> the same 4-utt global batch.
    specs = [
        _base_spec(workspace, out_dir, pid, 2, port + 1, max_frames=128)
        for pid in range(2)
    ]
    procs = [_run_worker(s) for s in specs]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, f"multi-proc worker failed:\n{e[-3000:]}"

    single = json.load(open(s_spec["out_path"]))
    r0 = json.load(open(specs[0]["out_path"]))
    r1 = json.load(open(specs[1]["out_path"]))

    assert r0["device_count"] == 4 and r1["device_count"] == 4
    # Both ranks observe identical global metrics.
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-5)
    assert r0["wer"] == r1["wer"]
    assert r0["step"] == r1["step"] == 3
    # And they match the single-process run over the same data.
    np.testing.assert_allclose(single["losses"], r0["losses"], rtol=2e-4)
    np.testing.assert_allclose(single["wer"], r0["wer"], atol=1e-9)
    # Rank 0 wrote the checkpoint; rank 1 did not.
    assert r0["ckpt_path"] and os.path.isdir(r0["ckpt_path"])
    assert r1["ckpt_path"] == ""
    # Cross-host WER aggregation produced per-rank prediction dumps.
    ckpt_dir = specs[0]["ckpt_dir"]
    assert os.path.exists(os.path.join(ckpt_dir, "tmp_prediction.rank0.txt"))
    assert os.path.exists(os.path.join(ckpt_dir, "tmp_prediction.rank1.txt"))
