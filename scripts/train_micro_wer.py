"""Train on the micro real-speech corpus and measure HELD-OUT WER across
every decode mode (VERDICT r4 next #1/#2/#3).

Corpus: conformer_tpu/tools/make_micro_corpus.py — novel-ordering,
novel-augmentation eval utterances built from the reference's real
recordings. The eval waveforms were never seen in training, so the WER
reported here is a genuine generalization number (closed vocabulary).

Runs:
    # full-lattice RNN-T loss
    python scripts/train_micro_wer.py --exp /tmp/micro_full --steps 3000
    # pruned RNN-T loss (recipe-default A/B, same data+seed)
    python scripts/train_micro_wer.py --exp /tmp/micro_pruned --pruned \
        --steps 3000
    # decode-mode WER sweep on an existing run
    python scripts/train_micro_wer.py --exp /tmp/micro_full --eval-only

Outputs <exp>/wer_results.json and loss curves in <exp>/metrics.jsonl.
On-TPU by default; --cpu pins jax to host (tests/conftest rules apply).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_config(meta: dict, exp: str, *, pruned: bool, steps: int,
                 seed: int = 777):
    from conformer_tpu.config import Config, ModelConfig

    cfg = Config()
    cfg.model = ModelConfig(
        input_dim=80,
        vocab_size=meta["vocab_size"],
        sos_eos_id=meta["vocab_size"] - 1,
        encoder_dim=96,
        encoder_num_layers=3,
        num_heads=4,
        hidden_dim=192,
        kernel_size=7,
        predictor_embed_size=64,
        predictor_hidden_size=64,
        predictor_dim=64,
        predictor_num_layers=1,
        join_dim=96,
        compute_dtype="float32",
        use_dynamic_chunk=False,
        use_dynamic_left_chunk=False,
        ctc_weight=0.2,
        # train the attention decoder so the rescoring decode mode is
        # exercised on genuinely trained weights
        attention_weight=0.3,
        decoder_num_layers=1,
        use_pruned_loss=pruned,
    )
    d = cfg.data
    d.train_data_list_path = meta["train_list"]
    d.dev_data_list_path = meta["eval_list"]
    d.test_data_list_path = meta["eval_list"]
    d.vocab_path = meta["vocab_path"]
    d.bpe_model = None
    d.speed_perturb = False      # corpus is pre-augmented with seeded perturbs
    d.dither = 0.1
    # no spec_aug: the corpus is already augmented (noise/gain/speed), and
    # 20-frame t-masks can erase an entire 0.5 s segment-word — the r5
    # first attempt collapsed to separator-only emissions with it on
    d.spec_aug = False
    d.filter_data = False
    d.sort = True
    d.sort_size = 64
    d.shuffle = True
    d.shuffle_size = 256
    # single bucket -> ONE compiled train-step shape (2-vCPU box: compiles
    # are the wall-clock tax); 280 frames covers 4x0.5 s at speed 0.9
    d.batch_type = "bucket"
    d.bucket_boundaries = (280,)
    d.max_frames_in_batch = 32 * 280
    d.max_label_len = 40
    t = cfg.train
    t.lr = 1.5e-3
    t.warmup_steps = 300
    t.accum_grad = 1
    t.max_steps = steps
    t.max_epochs = 100000
    t.seed = seed
    t.val_check_interval = 10**9   # final eval is the fixed-shape sweep below
    t.num_sanity_val_steps = 0
    t.log_every = 25
    t.checkpoint_dir = exp
    return cfg


def eval_decode_modes(cfg, params, meta: dict, *, beam_size: int = 8,
                      pad_t: int | None = None, batch: int = 16,
                      modes_filter=None) -> dict:
    """Fixed-shape WER sweep: every decode mode, one compile each."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conformer_tpu.data.audio import load_audio
    from conformer_tpu.data.tokenizer import Tokenizer, load_vocab
    from conformer_tpu.decode.beam_batched import beam_search_batch
    from conformer_tpu.decode.ctc_beam_batched import (
        ctc_prefix_beam_decode_batch,
    )
    from conformer_tpu.decode.ctc_decode import ctc_greedy_decode
    from conformer_tpu.decode.greedy import greedy_search_batch
    from conformer_tpu.decode.rescoring import attention_rescoring_batch
    from conformer_tpu.models import transducer
    from conformer_tpu.ops.fbank import fbank_numpy
    from conformer_tpu.train.metrics import WordErrorRate

    tok = Tokenizer(load_vocab(meta["vocab_path"]))
    entries = [json.loads(l) for l in open(meta["eval_list"])]
    feats_list, lens, truths = [], [], []
    for e in entries:
        wav, sr = load_audio(e["wav_path"])
        f = fbank_numpy(wav * (1 << 15), sample_rate=sr, dither=0.0)
        feats_list.append(f)
        lens.append(len(f))
        truths.append(e["transcript"])
    if pad_t is None:  # one static shape for the whole sweep
        pad_t = (max(lens) + 31) // 32 * 32
    assert max(lens) <= pad_t, f"pad_t too small: need {max(lens)}"
    n = len(entries)
    n_pad = (n + batch - 1) // batch * batch
    feats = np.zeros((n_pad, pad_t, 80), np.float32)
    flens = np.zeros((n_pad,), np.int32)
    for i, f in enumerate(feats_list):
        feats[i, : len(f)] = f
        flens[i] = len(f)
    flens[n:] = 1  # dummy rows

    mcfg = cfg.model

    @jax.jit
    def encode(feats_b, lens_b):
        return transducer.encode(params, feats_b, lens_b, mcfg)

    def sweep(decode_fn):
        wer = WordErrorRate()
        hyp_texts = []
        for s in range(0, n_pad, batch):
            fb = jnp.asarray(feats[s : s + batch])
            lb = jnp.asarray(flens[s : s + batch])
            enc_out, enc_lens = encode(fb, lb)
            hyps, hlens = decode_fn(enc_out, enc_lens)
            hyps, hlens = np.asarray(hyps), np.asarray(hlens)
            for i in range(batch):
                gi = s + i
                if gi >= n:
                    break
                text = tok.decode_ids(
                    hyps[i, : hlens[i]].tolist(), stop_id=mcfg.sos_eos_id
                )
                hyp_texts.append(text)
                wer.update([text], [truths[gi]])
        return wer.compute(), hyp_texts

    def greedy(enc_out, enc_lens):
        h, l, _ = greedy_search_batch(params, enc_out, enc_lens, mcfg)
        return h, l

    def beam(expansions, skip=0):
        f = jax.jit(
            lambda e, el: beam_search_batch(
                params, e, el, mcfg, beam_size=beam_size,
                max_expansions=expansions, max_hyp_len=64,
                blank_skip_window=skip,
            )[:2]
        )

        def run(enc_out, enc_lens):
            toks, lengths = f(enc_out, enc_lens)
            return toks[:, 0], lengths[:, 0]

        return run

    def ctc_greedy(enc_out, enc_lens):
        return ctc_greedy_decode(params, enc_out, enc_lens, mcfg)

    def ctc_beam(enc_out, enc_lens):
        toks, lengths, _ = ctc_prefix_beam_decode_batch(
            params, enc_out, enc_lens, mcfg, beam_size=beam_size,
            max_hyp_len=64,
        )
        return toks[:, 0], lengths[:, 0]

    def rescoring(enc_out, enc_lens):
        return attention_rescoring_batch(
            params, enc_out, enc_lens, mcfg, beam_size=beam_size,
            max_hyp_len=64,
        )

    modes = {
        "greedy_rnnt": greedy,
        "beam_rnnt_2exp": beam(2),
        "beam_rnnt_1exp": beam(1),
        # char-level models emit BURSTS (a word's chars cluster on the
        # segment-start frames), so the beam's expansion cap must cover the
        # per-frame burst: 6 expansions matches greedy here, 1-2 truncate
        # (fine for BPE models at ~0.1-0.3 emissions/frame, catastrophic
        # at char density — see docs/PERF.md r5)
        "beam_rnnt_6exp": beam(6),
        "beam_rnnt_6exp_skip8": beam(6, skip=8),
        "beam_rnnt_2exp_skip8": beam(2, skip=8),
        "beam_rnnt_1exp_skip8": beam(1, skip=8),
        "ctc_greedy": jax.jit(ctc_greedy),
        "ctc_prefix_beam": jax.jit(ctc_beam),
        "attention_rescoring": jax.jit(rescoring),
    }
    if modes_filter is not None:
        modes = {k: v for k, v in modes.items() if k in modes_filter}
    results = {}
    for name, fn in modes.items():
        t0 = time.time()
        wer, hyps = sweep(fn)
        results[name] = {
            "wer": round(wer, 4),
            "eval_s": round(time.time() - t0, 1),
            "example_hyp": hyps[0],
        }
        print(f"{name:22s} WER {wer:.4f}  ({time.time()-t0:.1f}s)", flush=True)
    results["_truth_example"] = truths[0]
    results["n_eval_utts"] = n
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/micro")
    ap.add_argument("--exp", required=True)
    ap.add_argument("--pruned", action="store_true")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save-fixture", default=None,
                    help="write trained params as a portable .npz fixture")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from conformer_tpu.tools.make_micro_corpus import build_micro_corpus

    meta_path = os.path.join(args.corpus, "meta.json")
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
    else:
        meta = build_micro_corpus(args.corpus)

    cfg = build_config(
        meta, args.exp, pruned=args.pruned, steps=args.steps, seed=args.seed
    )

    from conformer_tpu.train.loop import Trainer

    trainer = Trainer(cfg)
    if not args.eval_only:
        t0 = time.time()
        trainer.fit()
        print(f"training done in {time.time()-t0:.0f}s", flush=True)
    else:
        ckpts = sorted(
            d for d in os.listdir(args.exp)
            if os.path.isdir(os.path.join(args.exp, d))
        )
        trainer.restore(os.path.join(args.exp, ckpts[-1]))

    results = eval_decode_modes(cfg, trainer.state["params"], meta)
    results["pruned_loss"] = args.pruned
    results["steps"] = int(trainer.state["step"])
    out = os.path.join(args.exp, "wer_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))

    if args.save_fixture:
        from conformer_tpu.train.checkpoint import save_params_npz

        save_params_npz(args.save_fixture, trainer.state["params"])
        with open(args.save_fixture + ".meta.json", "w") as f:
            json.dump(
                {
                    "corpus_seed": meta["seed"],
                    "vocab_size": meta["vocab_size"],
                    "steps": results["steps"],
                    "pruned_loss": args.pruned,
                    "wer": {k: vv["wer"] for k, vv in results.items()
                            if isinstance(vv, dict) and "wer" in vv},
                },
                f, indent=1,
            )
        print(f"fixture saved to {args.save_fixture}")


if __name__ == "__main__":
    main()
