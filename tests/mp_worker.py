"""Worker process for the multi-host integration test (test_multiprocess.py).

Runs the real Trainer stack over jax.distributed on CPU devices: global
batch assembly across processes, GSPMD gradient all-reduce, cross-process
WER aggregation, rank-0 checkpoint save. Not collected by pytest (no test_
prefix); launched as `python mp_worker.py <json-args>`.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    spec = json.loads(sys.argv[1])
    # Env must be set before jax import.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={spec['local_devices']}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    sys.path.insert(0, spec["repo"])
    from conformer_tpu.config import Config, tiny_test_config
    from conformer_tpu.data.dataset import AsrDataset, eval_config
    from conformer_tpu.parallel import maybe_initialize_distributed
    from conformer_tpu.train.loop import Trainer

    if spec["num_processes"] > 1:
        initialized = maybe_initialize_distributed(
            coordinator=spec["coordinator"],
            num_processes=spec["num_processes"],
            process_id=spec["process_id"],
        )
        assert initialized and jax.process_count() == spec["num_processes"]

    cfg: Config = tiny_test_config()
    cfg.model.vocab_size = 6
    cfg.model.sos_eos_id = 5
    cfg.model.encoder_num_layers = 1
    cfg.model.hidden_dim = 64
    cfg.model.dropout = 0.0
    cfg.model.attention_dropout = 0.0
    cfg.model.pos_enc_dropout = 0.0
    cfg.model.predictor_embed_dropout = 0.0
    cfg.model.predictor_dropout = 0.0
    cfg.data.train_data_list_path = spec["data_list"]
    cfg.data.dev_data_list_path = spec["data_list"]
    cfg.data.vocab_path = spec["vocab"]
    cfg.data.dither = 0.0
    cfg.data.speed_perturb = False
    cfg.data.spec_aug = False
    cfg.data.shuffle = False
    cfg.data.sort = False
    cfg.data.filter_data = False
    cfg.data.batch_type = "bucket"
    cfg.data.bucket_boundaries = (64,)
    cfg.data.max_frames_in_batch = spec["max_frames_in_batch"]
    cfg.data.max_label_len = 8
    cfg.train.checkpoint_dir = spec["ckpt_dir"]
    cfg.train.accum_grad = 1
    cfg.train.warmup_steps = 10
    cfg.train.num_sanity_val_steps = 0

    trainer = Trainer(cfg)
    train_ds = AsrDataset(cfg.data, mode="train", tokenizer=trainer.tokenizer)
    dev_ds = AsrDataset(
        eval_config(cfg.data), mode="dev", tokenizer=trainer.tokenizer
    )

    losses = []
    stream = trainer._train_stream(train_ds)
    while len(losses) < spec["steps"]:
        epoch, batch = next(stream)
        if epoch is None:
            continue
        metrics = trainer.train_step([batch])
        losses.append(round(float(metrics["loss"]), 6))

    wer = trainer.validate(dev_ds)
    ckpt_path = trainer.save()

    out = {
        "process_id": spec["process_id"],
        "device_count": jax.device_count(),
        "losses": losses,
        "wer": wer,
        "step": int(trainer.state["step"]),
        "ckpt_path": ckpt_path,
    }
    with open(spec["out_path"], "w") as f:
        json.dump(out, f)
    print("WORKER_OK", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
