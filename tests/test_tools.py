"""Offline tools: LibriSpeech collection, CMVN stats, vocab conversion."""

import json
import os

import numpy as np

from conformer_tpu.data import audio
from conformer_tpu.models.cmvn import load_cmvn_stats
from conformer_tpu.tools.collect_librispeech import collect
from conformer_tpu.tools.compute_cmvn_stats import compute
from conformer_tpu.tools.convert_vocab import convert


def test_collect_librispeech_layout(tmp_path):
    # LibriSpeech-like tree: spk/chap/spk-chap-utt.wav + .trans.txt
    d = tmp_path / "LibriSpeech" / "19" / "198"
    d.mkdir(parents=True)
    wav = np.zeros(8000, np.float32)
    keys = ["19-198-0000", "19-198-0001"]
    for k in keys:
        audio.save_wav(str(d / f"{k}.wav"), wav, 16000)
    with open(d / "19-198.trans.txt", "w") as f:
        f.write("19-198-0000 HELLO THERE\n19-198-0001 SECOND LINE\n")

    out = tmp_path / "out"
    n = collect(str(tmp_path / "LibriSpeech"), str(out), audio_ext="wav")
    assert n == 2
    entries = [json.loads(l) for l in open(out / "data.list")]
    assert {e["key"] for e in entries} == set(keys)
    assert entries[0]["transcript"] in ("HELLO THERE", "SECOND LINE")
    assert os.path.exists(out / "transcripts.txt")


def test_cmvn_stats_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    entries = []
    for i in range(3):
        p = str(tmp_path / f"{i}.wav")
        audio.save_wav(p, rng.standard_normal(12000).astype(np.float32) * 0.2, 16000)
        entries.append({"key": str(i), "wav_path": p, "transcript": "X"})
    lst = str(tmp_path / "data.list")
    with open(lst, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    out = str(tmp_path / "global_cmvn")
    stats = compute(lst, out, num_workers=1)
    assert stats["frame_num"] > 0
    mean, istd = load_cmvn_stats(out)
    assert mean.shape == (80,) and istd.shape == (80,)
    assert np.isfinite(mean).all() and (istd > 0).all()


def test_convert_vocab(tmp_path):
    spm_vocab = tmp_path / "bpe.vocab"
    spm_vocab.write_text("<unk>\t0\n<s>\t0\n</s>\t0\n▁THE\t-2.5\nA\t-3.1\n")
    out = tmp_path / "vocab.txt"
    n = convert(str(spm_vocab), str(out))
    lines = out.read_text().splitlines()
    assert lines[0] == "<blank> 0"
    assert lines[1] == "<unk> 1"
    assert lines[2] == "▁THE 2"
    assert lines[-1] == f"<sos/eos> {n - 1}"
