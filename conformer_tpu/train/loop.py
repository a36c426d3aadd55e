"""Training loop: pjit train step over a device mesh, accumulation, eval.

TPU-native replacement for the Lightning Trainer + TransducerModule stack
(reference src/executor.py:136-164, src/module.py:9-143):
  - one donated, jitted train step per bucket shape (static shapes; the
    bucket set keeps the compile count small),
  - gradient accumulation by averaging `accum_grad` microbatch grads before
    a single optimizer step (reference accumulate_grad_batches=2),
  - batches sharded over the mesh "data" axis; GSPMD inserts the gradient
    all-reduce (replacing DDP/NCCL);
  - periodic validation: batched greedy RNN-T decode -> WER, transcript dump
    (tmp_prediction.txt triples, module.py:128-135), WER-stamped checkpoints
    + `last` (module.py:89-92), resume.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.dataset import AsrDataset, eval_config
from ..data.tokenizer import Tokenizer, load_vocab
from ..decode.greedy import greedy_search_batch
from ..models import cmvn as cmvn_mod
from ..models.transducer import encode, init_transducer, transducer_forward
from ..parallel import make_mesh, shard_batch, shard_params
from . import checkpoint as ckpt_mod
from .logging_util import MetricLogger
from .metrics import WordErrorRate
from .optimizer import make_optimizer

Params = Any


# Train state is a plain dict pytree {params, opt_state, step} (plain dict
# so it is both a JAX pytree and orbax-serializable).
TrainState = dict


def make_train_state(params, opt_state, step=0) -> dict:
    return {"params": params, "opt_state": opt_state, "step": jnp.asarray(step)}


class Trainer:
    """Builds the model/data/optimizer stack and runs train/eval.

    The reference Executor equivalent (src/executor.py:22-164), pure-JAX.
    """

    def __init__(self, cfg: Config, *, mesh=None, use_wandb: bool = False):
        self.cfg = cfg
        if cfg.train.remat and not cfg.model.remat:
            # TrainConfig.remat is the user-facing knob; the encoder reads it
            # off ModelConfig (the config that reaches traced code).
            cfg.model.remat = True
        self.encoder_fn = None  # pipeline-parallel encoder, when configured
        if cfg.train.mesh_pipe > 1:
            from ..parallel.pipeline import (
                encoder_forward_pipelined,
                make_pipeline_mesh,
            )

            assert cfg.train.mesh_model == 1, (
                "mesh_pipe composes with data parallelism; tensor parallelism "
                "(mesh_model) uses the GSPMD path — pick one"
            )
            self.mesh = mesh or make_pipeline_mesh(
                cfg.train.mesh_data, cfg.train.mesh_pipe
            )
            self.encoder_fn = partial(
                encoder_forward_pipelined,
                mesh=self.mesh,
                num_microbatches=cfg.train.pipeline_microbatches,
            )
        elif cfg.train.mesh_seq > 1:
            # dp+sp, or the full 3-axis dp+sp+tp mesh when mesh_model > 1:
            # params shard over "model" (shard_params keys on the axis name),
            # activations over ("data", "seq"), GSPMD composes the
            # collectives. PP stays exclusive of TP (shard_map owns the axes).
            from ..parallel.sequence import encoder_forward_seq, make_seq_mesh

            self.mesh = mesh or make_seq_mesh(
                cfg.train.mesh_data, cfg.train.mesh_seq, cfg.train.mesh_model
            )
            self.encoder_fn = partial(encoder_forward_seq, mesh=self.mesh)
        else:
            self.mesh = mesh or make_mesh(
                cfg.train.mesh_data, cfg.train.mesh_model
            )
        self.rng = jax.random.PRNGKey(cfg.train.seed)

        cmvn = (
            cmvn_mod.init_cmvn_from_file(cfg.data.cmvn_path)
            if cfg.data.cmvn_path
            else None
        )
        self.rng, k_init = jax.random.split(self.rng)
        params = init_transducer(k_init, cfg.model, cmvn=cmvn)
        self.tx, self.lr_schedule = make_optimizer(cfg.train, params)
        opt_state = self.tx.init(params)
        self.state = make_train_state(params, opt_state)
        self.state["params"] = shard_params(
            self.state["params"], self.mesh, model_parallel=True
        )
        if cfg.train.mesh_pipe > 1:
            # Pipeline mode only: the layer stack lives sliced over the
            # "pipe" axis. The sequence-parallel mesh has no such axis —
            # its encoder_fn keeps GSPMD-replicated layers.
            from ..parallel.pipeline import shard_stacked_layers

            self.state["params"]["encoder"]["layers"] = shard_stacked_layers(
                self.state["params"]["encoder"]["layers"], self.mesh
            )

        self.tokenizer: Tokenizer | None = None
        if cfg.data.vocab_path:
            self.tokenizer = Tokenizer(
                load_vocab(cfg.data.vocab_path),
                bpe_model=cfg.data.bpe_model,
                split_with_space=cfg.data.split_with_space,
            )

        self.logger = MetricLogger(cfg.train.checkpoint_dir, use_wandb=use_wandb)
        self._grad_fns: dict[tuple, Any] = {}
        self._decode_fns: dict[tuple, Any] = {}
        self._update_fn = None

    # ------------------------------------------------------------ train step

    def _grad_fn(self, shape_key):
        if shape_key not in self._grad_fns:
            mcfg = self.cfg.model
            encoder_fn = self.encoder_fn

            @jax.jit
            def compute_grads(params, feats, feat_lens, labels, label_lens, rng):
                def loss_fn(p):
                    out = transducer_forward(
                        p, feats, feat_lens, labels, label_lens, mcfg,
                        rng=rng, deterministic=False, encoder_fn=encoder_fn,
                    )
                    return out["loss"], out

                grads, out = jax.grad(loss_fn, has_aux=True)(params)
                metrics = {
                    "loss": out["loss"],
                    "loss_ctc": out["loss_ctc"],
                    "loss_rnnt": out["loss_rnnt"],
                }
                return grads, metrics

            self._grad_fns[shape_key] = compute_grads
        return self._grad_fns[shape_key]

    def _update(self, state, grads):
        if self._update_fn is None:

            @partial(jax.jit, donate_argnums=(0,))
            def update(state, grads):
                updates, new_opt = self.tx.update(
                    grads, state["opt_state"], state["params"]
                )
                import optax

                new_params = optax.apply_updates(state["params"], updates)
                return make_train_state(new_params, new_opt, state["step"] + 1)

            self._update_fn = update
        return self._update_fn(state, grads)

    def train_step(self, microbatches: list[dict]) -> dict:
        """One optimizer step over `accum_grad` microbatches.

        Grads and metrics accumulate as device arrays; the single host
        fetch happens after the (async-dispatched) optimizer update, so the
        step costs one device->host round trip, not one per microbatch
        (matters on relay backends with ~30 ms RTT).
        """
        grads_acc = None
        metrics_acc: dict[str, jax.Array] | None = None
        n = len(microbatches)
        for b in microbatches:
            feats = jnp.asarray(b["feats"])
            shape_key = feats.shape
            self.rng, k = jax.random.split(self.rng)
            sb = shard_batch(
                {
                    "feats": feats,
                    "feat_lengths": jnp.asarray(b["feat_lengths"]),
                    "labels": jnp.asarray(b["labels"]),
                    "label_lengths": jnp.asarray(b["label_lengths"]),
                },
                self.mesh,
            )
            grads, metrics = self._grad_fn(shape_key)(
                self.state["params"],
                sb["feats"],
                sb["feat_lengths"],
                sb["labels"],
                sb["label_lengths"],
                k,
            )
            grads = jax.tree.map(lambda g: g / n, grads)
            grads_acc = (
                grads
                if grads_acc is None
                else jax.tree.map(jnp.add, grads_acc, grads)
            )
            metrics_acc = (
                metrics
                if metrics_acc is None
                else jax.tree.map(jnp.add, metrics_acc, metrics)
            )
        self.state = self._update(self.state, grads_acc)
        host_metrics = jax.device_get(metrics_acc)
        out = {key: float(v) / n for key, v in host_metrics.items()}
        out["lr"] = float(self.lr_schedule(int(self.state["step"]) - 1))
        return out

    # ------------------------------------------------------------ validation

    def _decode_fn(self, shape_key):
        """Decode callable (params, feats, feat_lens) -> (hyps [B,L], lens [B])
        for the configured DecodeConfig.mode, cached per feats shape.

        The reference evals greedy RNN-T only (src/module.py:111-136); the
        extra modes expose the framework's CTC greedy/prefix-beam, batched
        RNN-T beam, and attention-rescoring decoders through the same
        --eval path.
        """
        if shape_key not in self._decode_fns:
            mcfg = self.cfg.model
            dcfg = self.cfg.decode
            n_steps = dcfg.n_steps
            max_hyp = dcfg.max_hyp_len
            mode = dcfg.mode

            if dcfg.streaming:
                # Chunk-simulated streaming eval (reference --streaming_eval,
                # module.py:117-121) as a jitted scan.
                from ..decode.streaming import streaming_greedy_search

                @jax.jit
                def decode(params, feats, feat_lens):
                    return streaming_greedy_search(
                        params, feats, feat_lens, mcfg,
                        decoding_chunk_size=dcfg.decoding_chunk_size,
                        num_decoding_left_chunks=dcfg.num_decoding_left_chunks,
                        n_steps=n_steps, max_hyp_len=max_hyp,
                    )

            elif mode == "greedy_rnnt":

                @jax.jit
                def decode(params, feats, feat_lens):
                    enc_out, enc_lens = encode(params, feats, feat_lens, mcfg)
                    hyps, lens, _ = greedy_search_batch(
                        params, enc_out, enc_lens, mcfg,
                        n_steps=n_steps, max_hyp_len=max_hyp,
                    )
                    return hyps, lens

            elif mode == "beam_rnnt":
                from ..decode.beam_batched import beam_search_batch

                @jax.jit
                def decode(params, feats, feat_lens):
                    enc_out, enc_lens = encode(params, feats, feat_lens, mcfg)
                    toks, lens, _ = beam_search_batch(
                        params, enc_out, enc_lens, mcfg,
                        beam_size=dcfg.beam_size, max_hyp_len=max_hyp,
                        max_expansions=dcfg.beam_expansions,
                        blank_skip_window=dcfg.beam_blank_skip_window,
                    )
                    return toks[:, 0], lens[:, 0]

            elif mode == "greedy_ctc":
                from ..decode.ctc_decode import ctc_greedy_decode

                @jax.jit
                def decode(params, feats, feat_lens):
                    enc_out, enc_lens = encode(params, feats, feat_lens, mcfg)
                    return ctc_greedy_decode(params, enc_out, enc_lens, mcfg)

            elif mode == "prefix_beam_ctc":
                # Batched device prefix beam (decode/ctc_beam_batched.py);
                # the host Hannun loop in decode/ctc_decode.py survives only
                # as the parity reference for its tests.
                from ..decode.ctc_beam_batched import (
                    ctc_prefix_beam_decode_batch,
                )

                top_c = dcfg.prefix_beam_top_c or mcfg.vocab_size

                @jax.jit
                def decode(params, feats, feat_lens):
                    enc_out, enc_lens = encode(params, feats, feat_lens, mcfg)
                    toks, lens, _ = ctc_prefix_beam_decode_batch(
                        params, enc_out, enc_lens, mcfg,
                        beam_size=dcfg.beam_size, max_hyp_len=max_hyp,
                        top_c=top_c,
                    )
                    return toks[:, 0], lens[:, 0]

            elif mode == "attention_rescoring":
                # Fully device-side: batched CTC prefix-beam n-best + one
                # batched decoder forward per direction, one jitted call.
                from ..decode.rescoring import attention_rescoring_batch

                top_c = dcfg.prefix_beam_top_c or mcfg.vocab_size

                @jax.jit
                def decode(params, feats, feat_lens):
                    enc_out, enc_lens = encode(params, feats, feat_lens, mcfg)
                    return attention_rescoring_batch(
                        params, enc_out, enc_lens, mcfg,
                        beam_size=dcfg.beam_size,
                        ctc_weight=dcfg.rescore_ctc_weight,
                        max_hyp_len=max_hyp, top_c=top_c,
                    )

            else:
                raise ValueError(
                    f"unknown decode.mode {mode!r}: expected greedy_rnnt | "
                    "beam_rnnt | greedy_ctc | prefix_beam_ctc | "
                    "attention_rescoring"
                )

            self._decode_fns[shape_key] = decode
        return self._decode_fns[shape_key]

    def validate(
        self, dataset: AsrDataset, max_batches: int | None = None
    ) -> float:
        """Greedy-decode the (host-local) eval shard and compute WER.

        Multi-process: each host decodes its own shard with a host-local
        replica of the params (eval batch shapes differ per host, so the
        decode cannot be a global computation), then error/word counts are
        summed across processes before the final WER — the reference
        all_gathers predictions for the same reason (src/module.py:87-96).
        """
        from ..parallel import allsum_host_scalars, gather_tree_to_host

        multiprocess = jax.process_count() > 1
        params = (
            gather_tree_to_host(self.state["params"], self.mesh)
            if multiprocess
            else self.state["params"]
        )
        wer = WordErrorRate()
        fname = (
            "tmp_prediction.txt"
            if not multiprocess
            else f"tmp_prediction.rank{jax.process_index()}.txt"
        )
        out_path = os.path.join(self.cfg.train.checkpoint_dir, fname)
        os.makedirs(self.cfg.train.checkpoint_dir, exist_ok=True)
        with open(out_path, "w") as out_stream:
            for bi, b in enumerate(dataset):
                if max_batches is not None and bi >= max_batches:
                    break
                feats = jnp.asarray(b["feats"])
                hyps, lens = self._decode_fn(feats.shape)(
                    params, feats, jnp.asarray(b["feat_lengths"])
                )
                hyps, lens = np.asarray(hyps), np.asarray(lens)
                preds = []
                for i, key in enumerate(b["keys"]):
                    ids = hyps[i, : lens[i]].tolist()
                    text = (
                        self.tokenizer.decode_ids(
                            ids, stop_id=self.cfg.model.sos_eos_id
                        )
                        if self.tokenizer
                        else " ".join(map(str, ids))
                    )
                    preds.append(text)
                    out_stream.write(
                        f"Key: {key}\nPred: {text}\nTruth: {b['transcripts'][i]}\n"
                    )
                wer.update(preds, b["transcripts"])
        if multiprocess:
            counts = allsum_host_scalars(
                {"errors": float(wer.errors), "total": float(wer.total)}
            )
            return counts["errors"] / max(counts["total"], 1.0)
        return wer.compute()

    # ------------------------------------------------------------------ fit

    def install_preemption_handler(self) -> None:
        """Checkpoint-on-SIGTERM for preemptible TPU VMs (the reference has
        no failure handling at all, SURVEY.md §5.3 — crash-resume there is
        a manual rerun with --resume). The handler only sets a flag; the
        step loop checkpoints at the next step boundary so the Orbax write
        sees a consistent state, then exits cleanly (resumable with
        --resume_from last)."""
        import signal

        def _on_sigterm(signum, frame):
            self._preempted = True

        signal.signal(signal.SIGTERM, _on_sigterm)

    def _maybe_handle_preemption(self) -> bool:
        if getattr(self, "_preempted", False):
            path = self.save()
            self.logger.log(
                int(self.state["step"]), {"preempted": 1.0}, prefix="train_"
            )
            print(f"SIGTERM: checkpointed to {path}; exiting for resume.")
            return True
        return False

    def fit(self) -> None:
        cfg = self.cfg
        train_ds = AsrDataset(cfg.data, mode="train", tokenizer=self.tokenizer)
        dev_ds = AsrDataset(
            eval_config(cfg.data), mode="dev", tokenizer=self.tokenizer
        )

        if cfg.train.resume_from:
            self.restore(cfg.train.resume_from)
        if cfg.train.num_sanity_val_steps > 0:
            self.validate(dev_ds, max_batches=cfg.train.num_sanity_val_steps)

        step = int(self.state["step"])
        accum: list[dict] = []
        running: dict[str, float] = {}
        multiprocess = jax.process_count() > 1
        # Host pipeline on a background thread (data/prefetch.py): wav
        # decode/resample/fbank overlap the device step instead of
        # serializing with it (the reference's DataLoader-workers role,
        # src/executor.py:121-134).
        stream = self._train_stream(train_ds)
        if cfg.data.prefetch_depth > 0:
            from ..data.prefetch import Prefetcher

            stream = Prefetcher(stream, depth=cfg.data.prefetch_depth)
        try:
            self._fit_loop(stream, train_ds, dev_ds, accum, running,
                           multiprocess)
        finally:
            if hasattr(stream, "close"):
                stream.close()

    def _fit_loop(self, stream, train_ds, dev_ds, accum, running,
                  multiprocess) -> None:
        cfg = self.cfg
        step = int(self.state["step"])
        for epoch, batch in stream:
            if epoch is None:  # single-process epoch boundary
                self.save()
                continue
            accum.append(batch)
            if len(accum) < cfg.train.accum_grad:
                continue
            metrics = self.train_step(accum)
            accum = []
            step = int(self.state["step"])
            if self._maybe_handle_preemption():
                return
            for k, v in metrics.items():
                running[k] = running.get(k, 0.0) + v
            if step % cfg.train.log_every == 0:
                logs = {k: v / cfg.train.log_every for k, v in running.items()}
                if train_ds.padding_stats.total_frames:
                    # bucket padding waste (SURVEY hard part #3) — measured,
                    # cumulative over the run
                    logs["padding_efficiency"] = (
                        train_ds.padding_stats.efficiency
                    )
                self.logger.log(step, logs, prefix="train_")
                running = {}
            if step % cfg.train.val_check_interval == 0:
                wer = self.validate(dev_ds)
                self.logger.log(step, {"wer": wer}, prefix="valid_")
                self.save(wer=wer)
            if step >= cfg.train.max_steps:
                self.save()
                return
        if not multiprocess:
            return
        self.save()

    def _train_stream(self, train_ds: AsrDataset):
        """Yield (epoch, batch) pairs; (None, None) marks an epoch boundary.

        Single-process: plain max_epochs loop. Multi-process: hosts can
        hold different shard sizes, so epoch boundaries are NOT globally
        synchronized — the stream wraps epochs seamlessly and training is
        driven by max_steps; every global step then has all hosts
        presenting a batch (the collective contract)."""
        cfg = self.cfg
        if jax.process_count() > 1:
            epoch = 0
            while True:
                train_ds.set_epoch(epoch)
                got = False
                for batch in train_ds:
                    got = True
                    yield epoch, batch
                epoch += 1
                if not got:  # empty shard: avoid a spin loop
                    return
        else:
            for epoch in range(cfg.train.max_epochs):
                train_ds.set_epoch(epoch)
                for batch in train_ds:
                    yield epoch, batch
                yield None, None

    # ----------------------------------------------------------- checkpoints

    def save(self, wer: float | None = None) -> str:
        state = self.state
        if jax.process_count() > 1:
            # Both the gather and the orbax write below are collectives:
            # every process participates, the bytes land once via the
            # primary host (the reference's rank-0 save, module.py:89-92).
            from ..parallel import gather_tree_to_host

            state = gather_tree_to_host(self.state, self.mesh)
        elif jax.process_index() != 0:  # pragma: no cover - defensive
            return ""
        return ckpt_mod.save_checkpoint(
            self.cfg.train.checkpoint_dir,
            state,
            step=int(self.state["step"]),
            wer=wer,
            keep=self.cfg.train.keep_checkpoints,
        )

    def restore(self, path_or_dir: str) -> None:
        path = path_or_dir
        if os.path.isdir(path) and not os.path.basename(path).startswith("step_"):
            found = ckpt_mod.latest_checkpoint(path)
            if found is None:
                raise FileNotFoundError(f"no checkpoint under {path}")
            path = found
        self.state = ckpt_mod.restore_checkpoint(path, self.state)
        self.state["params"] = shard_params(self.state["params"], self.mesh)

    def load_torch_checkpoint(self, path: str) -> None:
        """WeNet/reference interop (reference model.py:66-69)."""
        self.state["params"] = ckpt_mod.import_torch_checkpoint(
            path, self.state["params"], self.cfg.model
        )
