"""Numerical parity with the reference torch model (/root/reference/src).

Builds the reference Transducer (torch, random-init), exports its
state_dict, imports it through `import_torch_checkpoint`
(train/checkpoint.py), and asserts that encoder outputs, predictor outputs,
joint logits, CTC + RNN-T losses, and greedy decode match within float32
tolerance. Parity flags: conv_norm="batch_norm" (reference BatchNorm1d,
src/convolution.py:25) and rel_mode="ref_batch"/"ref_abs" (the reference's
no-rel-shift matrix_bd, src/attention.py:80-86 — degenerate pe[batch_index]
in batched training, absolute key positions in the chunk/eval path).

torchaudio is not installed in this image, so `torchaudio.functional
.rnnt_loss` is stubbed with the float64 NumPy lattice DP oracle from
test_rnnt_loss (only the reference's loss path uses it).
"""

from __future__ import annotations

import dataclasses
import sys
import types
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_rnnt_loss import numpy_rnnt_nll  # noqa: E402 (same-dir import)

from conformer_tpu.config import ModelConfig  # noqa: E402
from conformer_tpu.decode.greedy import greedy_search_batch  # noqa: E402
from conformer_tpu.models import joint as joint_mod, predictor as pred_mod  # noqa: E402
from conformer_tpu.models.encoder import encoder_forward  # noqa: E402
from conformer_tpu.models.transducer import (  # noqa: E402
    encode,
    init_transducer,
    transducer_forward,
)
from conformer_tpu.train.checkpoint import import_torch_checkpoint  # noqa: E402

REF_SRC = "/root/reference/src"
# every module the reference wires import by bare name
_REF_MODULE_NAMES = (
    "model", "encoder", "encoder_layer", "attention", "convolution",
    "feedforward", "predictor", "joint", "decoder", "decoder_layer",
    "utils", "cmvn", "label_smoothing_loss",
)


def _stub_torchaudio():
    """Minimal torchaudio stand-in: functional.rnnt_loss via the float64
    NumPy DP oracle (same recursion torchaudio documents)."""

    def rnnt_loss(logits, targets, logit_lengths, target_lengths,
                  blank=0, reduction="mean"):
        lp = torch.log_softmax(logits.detach().to(torch.float64), dim=-1).numpy()
        tg = targets.detach().numpy()
        tl = logit_lengths.detach().numpy()
        ul = target_lengths.detach().numpy()
        nll = np.array(
            [
                numpy_rnnt_nll(lp[i], tg[i], int(tl[i]), int(ul[i]), blank=blank)
                for i in range(lp.shape[0])
            ]
        )
        if reduction == "mean":
            return torch.tensor(nll.mean(), dtype=torch.float32)
        if reduction == "sum":
            return torch.tensor(nll.sum(), dtype=torch.float32)
        return torch.tensor(nll, dtype=torch.float32)

    ta = types.ModuleType("torchaudio")
    func = types.ModuleType("torchaudio.functional")
    func.rnnt_loss = rnnt_loss
    ta.functional = func
    return ta, func


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules without polluting sys.modules/path."""
    stubbed = "torchaudio" not in sys.modules
    if stubbed:
        ta, func = _stub_torchaudio()
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = func
    saved = {n: sys.modules.pop(n, None) for n in _REF_MODULE_NAMES}
    sys.path.insert(0, REF_SRC)
    try:
        import attention as r_attention  # noqa: F401 (dependency chain)
        import convolution as r_convolution  # noqa: F401
        import decoder as r_decoder
        import encoder as r_encoder
        import joint as r_joint
        import model as r_model
        import predictor as r_predictor

        mods = SimpleNamespace(
            model=r_model, encoder=r_encoder, predictor=r_predictor,
            joint=r_joint, decoder=r_decoder,
        )
    finally:
        sys.path.remove(REF_SRC)
        for n in _REF_MODULE_NAMES:
            if saved[n] is not None:
                sys.modules[n] = saved[n]
            else:
                sys.modules.pop(n, None)
    yield mods
    if stubbed:
        sys.modules.pop("torchaudio", None)
        sys.modules.pop("torchaudio.functional", None)


# ---------------------------------------------------------------- fixtures

VOCAB, D, HEADS, LAYERS, HID, KERNEL = 32, 32, 2, 2, 48, 7
P_EMB, P_HID, P_DIM, P_LAYERS, JOIN = 24, 24, 24, 1, 40


def _jax_cfg(rel_mode: str) -> ModelConfig:
    return ModelConfig(
        input_dim=80, vocab_size=VOCAB, sos_eos_id=VOCAB - 1,
        encoder_dim=D, encoder_num_layers=LAYERS, num_heads=HEADS,
        hidden_dim=HID, kernel_size=KERNEL,
        dropout=0.0, attention_dropout=0.0, pos_enc_dropout=0.0,
        use_relative=True, rel_mode=rel_mode, conv_norm="batch_norm",
        use_dynamic_chunk=False, use_dynamic_left_chunk=False,
        predictor_embed_size=P_EMB, predictor_hidden_size=P_HID,
        predictor_dim=P_DIM, predictor_num_layers=P_LAYERS,
        predictor_embed_dropout=0.0, predictor_dropout=0.0,
        join_dim=JOIN, ctc_weight=0.2, transducer_weight=0.8,
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def torch_model(ref):
    torch.manual_seed(7)
    enc = ref.encoder.ConformerEncoder(
        input_dim=80, kernel_size=KERNEL, encoder_dim=D, dropout=0.0,
        attention_dropout=0.0, pos_enc_dropout=0.0, hidden_dim=HID,
        num_heads=HEADS, encoder_num_layers=LAYERS, cmvn=None,
        max_len=5000, use_relative=True, use_dynamic_chunk_size=False,
        use_dynamic_left_chunk=False, static_chunk_size=-1,
    )
    ctc = ref.decoder.CTCDecoder(vocab_size=VOCAB, encoder_dim=D, dropout=0.0)
    pred = ref.predictor.RNNPredictor(
        vocab_size=VOCAB, embed_size=P_EMB, output_size=P_DIM,
        hidden_size=P_HID, embed_dropout=0.0, num_layers=P_LAYERS,
        dropout=0.0,
    )
    joint = ref.joint.TransducerJoint(
        vocab_size=VOCAB, enc_output_size=D, pred_output_size=P_DIM,
        join_dim=JOIN,
    )
    model = ref.model.Transducer(
        encoder=enc, predictor=pred, joint=joint, ctc=ctc,
        vocab_size=VOCAB, blank=0, sos=VOCAB - 1, eos=VOCAB - 1,
        ignore_id=-1, ctc_weight=0.2, transducer_weight=0.8,
    )
    # Bias the joint toward blank so greedy decode terminates like a trained
    # model on both sides (identical weights, so parity is unaffected).
    with torch.no_grad():
        model.joint.ffn_out.bias[0] += 4.0
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params(torch_model, tmp_path_factory):
    path = tmp_path_factory.mktemp("torch_ckpt") / "ref_model.pt"
    torch.save(torch_model.state_dict(), str(path))
    cfg = _jax_cfg("ref_batch")
    template = init_transducer(jax.random.PRNGKey(0), cfg)
    return import_torch_checkpoint(str(path), template, cfg)


def _batch():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 96, 80)).astype(np.float32)
    feat_lens = np.array([96, 70], np.int32)
    labels = rng.integers(1, VOCAB - 2, size=(2, 5)).astype(np.int32)
    label_lens = np.array([5, 3], np.int32)
    return feats, feat_lens, labels, label_lens


# ------------------------------------------------------------------- tests


class TestImportCoverage:
    def test_no_missing_keys(self, torch_model, jax_params, capsys):
        """Every reference parameter must land somewhere in our tree: the
        import prints a warning listing missing keys if the name map rots."""
        assert "keys missing" not in capsys.readouterr().out


class TestForwardParity:
    def test_encoder_outputs_match(self, torch_model, jax_params):
        feats, feat_lens, _, _ = _batch()
        with torch.no_grad():
            ref_out, ref_mask = torch_model.encoder(
                torch.tensor(feats), torch.tensor(feat_lens)
            )
        cfg = _jax_cfg("ref_batch")
        out, mask = encoder_forward(
            jax_params["encoder"], jnp.asarray(feats), jnp.asarray(feat_lens),
            cfg, deterministic=True,
        )
        np.testing.assert_array_equal(
            np.asarray(mask), ref_mask.squeeze(1).numpy()
        )
        valid = np.asarray(mask)[..., None]
        np.testing.assert_allclose(
            np.asarray(out) * valid, ref_out.numpy() * valid,
            rtol=1e-4, atol=1e-4,
        )

    def test_predictor_outputs_match(self, torch_model, jax_params):
        cfg = _jax_cfg("ref_batch")
        ids = np.array([[0, 3, 5, 1], [0, 2, 2, 4]], np.int32)
        with torch.no_grad():
            ref_out = torch_model.predictor(torch.tensor(ids, dtype=torch.long))
        out = pred_mod.predictor_forward(
            jax_params["predictor"], jnp.asarray(ids), cfg, deterministic=True
        )
        np.testing.assert_allclose(
            np.asarray(out), ref_out.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_joint_logits_match(self, torch_model, jax_params):
        rng = np.random.default_rng(3)
        enc = rng.normal(size=(2, 7, D)).astype(np.float32)
        pred = rng.normal(size=(2, 4, P_DIM)).astype(np.float32)
        with torch.no_grad():
            ref_logits = torch_model.joint(
                torch.tensor(enc), torch.tensor(pred)
            )  # [B, T, U, V]
        logits = joint_mod.joint_lattice(
            jax_params["joint"], jnp.asarray(enc), jnp.asarray(pred)
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_losses_match(self, torch_model, jax_params):
        feats, feat_lens, labels, label_lens = _batch()
        batch = (
            ["a", "b"],
            torch.tensor(feats),
            torch.tensor(feat_lens),
            torch.tensor(labels, dtype=torch.long),
            torch.tensor(label_lens),
            ["", ""],
        )
        with torch.no_grad():
            ref_out = torch_model(batch)
        cfg = _jax_cfg("ref_batch")
        out = transducer_forward(
            jax_params, jnp.asarray(feats), jnp.asarray(feat_lens),
            jnp.asarray(labels), jnp.asarray(label_lens), cfg,
            deterministic=True,
        )
        np.testing.assert_allclose(
            float(out["loss_ctc"]), float(ref_out["loss_ctc"]),
            rtol=2e-4,
        )
        np.testing.assert_allclose(
            float(out["loss_rnnt"]), float(ref_out["loss_rnnt"]),
            rtol=2e-4,
        )
        np.testing.assert_allclose(
            float(out["loss"]), float(ref_out["loss"]), rtol=2e-4
        )


class TestDecodeParity:
    def test_greedy_decode_matches(self, torch_model, jax_params):
        """Reference greedy_search (whole-utterance-as-one-chunk, absolute
        key positions — model.py:206-209 quirk) vs our encode(rel_mode=
        "ref_abs") + batched greedy."""
        rng = np.random.default_rng(11)
        feats = rng.normal(size=(1, 128, 80)).astype(np.float32)
        with torch.no_grad():
            ref_hyps = torch_model.greedy_search(
                torch.tensor(feats), torch.tensor([128])
            )
        cfg = _jax_cfg("ref_abs")
        enc_out, enc_lens = encode(
            jax_params, jnp.asarray(feats), jnp.asarray([128]), cfg
        )
        hyps, lens, _ = greedy_search_batch(
            jax_params, enc_out, enc_lens, cfg, n_steps=64, max_hyp_len=256
        )
        ours = np.asarray(hyps)[0, : int(lens[0])].tolist()
        assert ours == list(ref_hyps), (
            f"greedy mismatch: ours={ours[:20]} ref={list(ref_hyps)[:20]}"
        )
