"""Unified configuration for the whole framework.

The reference spreads configuration over four uncoordinated mechanisms
(argparse in src/main.py:5-61, JSON data config exp/data_config.json, a
hardcoded serving dataclass src/deploy_common.py:6-44, and shell scripts).
Here a single set of dataclasses covers model / data / training / decoding,
serializable to JSON, loadable from CLI overrides.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass
class ModelConfig:
    """Conformer transducer architecture.

    Defaults reproduce the reference's Conformer-M recipe
    (/root/reference/train.sh:12-53).
    """

    input_dim: int = 80
    vocab_size: int = 5002
    blank_id: int = 0
    sos_eos_id: int = 5001
    ignore_id: int = -1

    # Encoder (reference: src/encoder.py:9-52)
    encoder_dim: int = 256
    encoder_num_layers: int = 12
    num_heads: int = 4
    hidden_dim: int = 2048          # FFN inner dim
    kernel_size: int = 15           # depthwise conv kernel
    dropout: float = 0.1
    attention_dropout: float = 0.1
    pos_enc_dropout: float = 0.1
    max_len: int = 5000             # positional table length
    use_relative: bool = True       # rel-pos MHSA vs absolute sinusoidal
    # "skew": Transformer-XL table + pad/reshape skew (fastest measured:
    # 9169 vs 8519 audio-s/s on v5e at Conformer-M shapes);
    # "decomposed": exact sinusoid angle-addition factorization (two
    # matmuls, no table length limit — use for very long utterances);
    # "ref_abs" / "ref_batch": reference bug-parity modes for checkpoint
    # import (raw absolute key positions / degenerate pe[batch_index],
    # reproducing reference src/attention.py:80-86 — no rel-shift).
    rel_mode: str = "skew"
    # Fused Pallas flash-attention for deterministic (inference) forward
    # passes; training and cached-streaming keep the XLA path.
    use_pallas_attention: bool = False
    # Fused conv-block kernel (pre-norm + pw/GLU/depthwise/LN/swish/pw +
    # residual in one VMEM pass) for deterministic full-utterance forwards.
    use_pallas_conv: bool = False
    # Conv module norm: the reference uses BatchNorm1d (streaming-hostile,
    # src/convolution.py:25); default here is layer_norm ("fix by default,
    # flag for parity" per SURVEY.md §5.7).
    conv_norm: str = "layer_norm"   # "layer_norm" | "batch_norm"
    causal_conv: bool = False

    # Dynamic-chunk streaming training (reference: src/utils.py:115-146)
    use_dynamic_chunk: bool = True
    use_dynamic_left_chunk: bool = True
    static_chunk_size: int = -1

    # Predictor (reference: src/predictor.py:14-87)
    predictor_embed_size: int = 256
    predictor_hidden_size: int = 256
    predictor_dim: int = 256        # projection output size
    predictor_num_layers: int = 2
    predictor_embed_dropout: float = 0.1
    predictor_dropout: float = 0.1

    # Joint (reference: src/joint.py:4-38)
    join_dim: int = 512

    # Loss weights (reference: src/model.py:86, train.sh:26-28)
    ctc_weight: float = 0.2
    transducer_weight: float = 0.8
    # Pruned transducer loss (k2-style two-pass; the reference carries the
    # k2 knobs lm_only_scale/am_only_scale unused — here they work):
    use_pruned_loss: bool = False
    prune_range: int = 5
    simple_loss_scale: float = 0.5
    # Pallas wavefront lattice DP (ops/pallas/rnnt_kernel.py) for the
    # transducer loss: ~12x faster forward / ~15x faster fwd+bwd than the
    # XLA scan on v5e at Conformer-M shapes.
    use_pallas_rnnt: bool = False
    # Fused joint-lattice kernel (ops/pallas/joint_kernel.py): computes
    # (lp_blank, lp_emit) with W resident in VMEM and an online logsumexp
    # over V tiles — the [B,T,U+1,V] logits never touch HBM; analytic VJP
    # replaces the rematerialized XLA chunk map.
    use_pallas_joint: bool = False
    # T-chunk size for the rematerialized XLA joint-lattice map. Swept on
    # v5e at Conformer-M b=32/T'=374: 32→186 ms, 64→191, 96→184, 128→158,
    # 160→260, 192→207 (loss fwd+bwd) — fewer, MXU-filling chunks win
    # until the chunk logits pressure HBM.
    rnnt_t_chunk: int = 128
    # Fused single-program CTC DP kernel (ops/pallas/ctc_kernel.py): the
    # whole alpha/beta recursion runs as an on-chip fori_loop over
    # VMEM-resident [B_tile, 2U+1] state with an analytic VJP, replacing
    # the 374-step XLA lax.scan that is latency-bound on TPU.
    use_pallas_ctc: bool = False
    attention_weight: float = 0.0   # attention decoder head (optional)
    lsm_weight: float = 0.1         # label smoothing for attention decoder
    reverse_weight: float = 0.0     # right-to-left decoder weight

    # Attention decoder (reference declares but never trains it; we support it)
    decoder_num_layers: int = 0     # 0 disables the attention decoder
    decoder_hidden_dim: int = 2048

    # Rematerialization: jax.checkpoint over the encoder-layer scan body,
    # trading recompute for activation memory (Conformer-L training).
    # TrainConfig.remat mirrors into this field at Trainer build time.
    remat: bool = False

    # Numerics
    compute_dtype: str = "bfloat16"   # activations dtype on TPU
    param_dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.encoder_dim // self.num_heads


@dataclass
class DataConfig:
    """Host-side data pipeline.

    Mirrors exp/data_config.json of the reference; bucketed static batching
    replaces `dynamic_batch` because TPUs need static shapes (SURVEY.md §7).
    """

    train_data_list_path: str = ""
    dev_data_list_path: str = ""
    test_data_list_path: str = ""
    vocab_path: str = ""
    cmvn_path: str = ""
    bpe_model: str | None = None
    non_lang_syms: str | None = None
    split_with_space: bool = False

    resample_rate: int = 16000
    speed_perturb: bool = True
    speeds: Sequence[float] = (0.9, 1.0, 1.1)

    feat_type: str = "fbank"        # "fbank" | "mfcc"
    num_mel_bins: int = 80
    frame_length: float = 25.0      # ms
    frame_shift: float = 10.0       # ms
    dither: float = 0.1
    num_ceps: int = 40              # mfcc only
    low_freq: float = 20.0
    high_freq: float = 0.0          # <=0 -> nyquist + high_freq

    spec_aug: bool = True
    num_t_mask: int = 2
    num_f_mask: int = 2
    max_t: int = 50
    max_f: int = 50

    filter_data: bool = True
    max_length: float = 1650        # frames (10ms units)
    min_length: float = 10
    token_max_length: int = 200
    token_min_length: int = 1
    min_output_input_ratio: float = 0.0005
    max_output_input_ratio: float = 1.0

    shuffle: bool = True
    shuffle_size: int = 1500
    sort: bool = True
    sort_size: int = 500
    # Batches prefetched ahead of the device on a background thread
    # (data/prefetch.py); 0 disables. The DataLoader-workers equivalent.
    prefetch_depth: int = 4

    batch_type: str = "bucket"      # "bucket" | "static" | "dynamic"
    batch_size: int = 16            # static batching
    max_frames_in_batch: int = 8000 # dynamic + bucket budget
    # Length-bucket boundaries in feature frames; each bucket pads to its
    # upper edge, giving a small closed set of compiled shapes.
    bucket_boundaries: Sequence[int] = (256, 512, 768, 1024, 1280, 1650)
    max_label_len: int = 200
    extend_epochs: int = 0          # ref self-extends the list 2^10x (dataset.py:86-88)


@dataclass
class TrainConfig:
    """Optimizer + runtime (reference: src/executor.py:136-154, src/scheduler.py)."""

    lr: float = 1e-3
    warmup_steps: int = 25000
    grad_clip: float = 4.0
    accum_grad: int = 2
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    max_steps: int = 1_000_000
    max_epochs: int = 1000
    seed: int = 777
    val_check_interval: int = 10000
    num_sanity_val_steps: int = 2
    log_every: int = 100
    checkpoint_dir: str = "experiments/default"
    resume_from: str | None = None
    keep_checkpoints: int = 5

    # Mesh: total devices factorized into (data, model) axes — or, with
    # mesh_pipe > 1, into (data, pipe): the encoder layer stack runs as a
    # GPipe collective-permute pipeline (parallel/pipeline.py).
    mesh_data: int = -1             # -1 -> all devices
    mesh_model: int = 1
    mesh_pipe: int = 1              # pipeline stages over encoder layers
    pipeline_microbatches: int = 2  # per data shard, when mesh_pipe > 1
    mesh_seq: int = 1               # sequence (time-axis) shards for
                                    # long-form audio (parallel/sequence.py)
    donate_state: bool = True
    remat: bool = False             # jax.checkpoint over encoder layers


@dataclass
class DecodeConfig:
    mode: str = "greedy_rnnt"       # greedy_rnnt | beam_rnnt | greedy_ctc
                                    # | prefix_beam_ctc | attention_rescoring
    n_steps: int = 64               # max emissions per frame (model.py:241)
    max_hyp_len: int = 256
    beam_size: int = 8
    beam_expansions: int = 2        # non-blank expansion rounds per frame
    # >0: approximate blank-run frame skipping in the batched RNN-T beam
    # (decode/beam_batched.py); the window of frames scored per joint eval
    beam_blank_skip_window: int = 0
    # attention_rescoring: CTC-score interpolation weight
    # (WeNet-style score = attn + w * ctc)
    rescore_ctc_weight: float = 0.5
    # prefix_beam_ctc / attention_rescoring n-best: per-frame candidate
    # labels kept by the device prefix beam (ctc_beam_batched.py); the
    # usual WeNet pruning width. 0 = exact search (top_c = vocab_size).
    prefix_beam_top_c: int = 16
    streaming: bool = False
    decoding_chunk_size: int = 16   # in subsampled frames
    num_decoding_left_chunks: int = -1
    # Serve the big dense layers as int8 (ops/quant.py): per-channel weight
    # + dynamic per-row activation quantization on the int8 MXU path.
    quantize_int8: bool = False


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        def build(tp, sub):
            known = {f.name for f in dataclasses.fields(tp)}
            return tp(**{k: v for k, v in sub.items() if k in known})

        return cls(
            model=build(ModelConfig, d.get("model", {})),
            data=build(DataConfig, d.get("data", {})),
            train=build(TrainConfig, d.get("train", {})),
            decode=build(DecodeConfig, d.get("decode", {})),
        )

    @classmethod
    def from_json_file(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def apply_overrides(self, overrides: Sequence[str]) -> "Config":
        """Apply dotted `section.key=value` CLI overrides."""
        d = dataclasses.asdict(self)
        for ov in overrides:
            key, _, raw = ov.partition("=")
            section, _, name = key.partition(".")
            if section not in d or name not in d[section]:
                raise KeyError(f"unknown config override: {ov!r}")
            cur = d[section][name]
            if isinstance(cur, bool):
                val: Any = raw.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                val = int(raw)
            elif isinstance(cur, float):
                val = float(raw)
            elif isinstance(cur, (list, tuple)):
                val = json.loads(raw)
            else:
                val = None if raw == "null" else raw
            d[section][name] = val
        return Config.from_dict(d)


def tiny_test_config() -> Config:
    """A small config for unit tests / CI (Conformer-S-ish, BASELINE config #1)."""
    cfg = Config()
    cfg.model = ModelConfig(
        input_dim=80,
        vocab_size=64,
        sos_eos_id=63,
        encoder_dim=64,
        encoder_num_layers=2,
        num_heads=4,
        hidden_dim=128,
        kernel_size=7,
        predictor_embed_size=32,
        predictor_hidden_size=32,
        predictor_dim=32,
        predictor_num_layers=1,
        join_dim=64,
        compute_dtype="float32",
        use_dynamic_chunk=False,
        use_dynamic_left_chunk=False,
    )
    cfg.train.accum_grad = 1
    cfg.train.warmup_steps = 10
    return cfg
