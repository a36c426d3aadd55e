"""Gradio demo path (reference backend/gradio_server.py:13-42) exercised
with a minimal fake `gradio` module: build_app's real wiring — stream
callback -> runner.accept_chunk, Reset button -> fresh session — runs
end-to-end; only the UI widgets are stubbed.
"""

import sys
import types

import numpy as np
import pytest

from conformer_tpu.config import tiny_test_config
from conformer_tpu.serve.runner import ModelRunner


class _FakeComponent:
    def __init__(self, *a, **k):
        pass


class _FakeAudio(_FakeComponent):
    def __init__(self, *a, **k):
        self.stream_fn = None

    def stream(self, fn, inputs=None, outputs=None):
        self.stream_fn = fn


class _FakeButton(_FakeComponent):
    def __init__(self, *a, **k):
        self.click_fn = None

    def click(self, fn, inputs=None, outputs=None):
        self.click_fn = fn


class _FakeBlocks:
    instances: list["_FakeBlocks"] = []

    def __init__(self, *a, **k):
        self.audio: _FakeAudio | None = None
        self.button: _FakeButton | None = None
        _FakeBlocks.instances.append(self)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def launch(self, **k):
        raise AssertionError("launch() must not be called in tests")


@pytest.fixture()
def fake_gradio(monkeypatch):
    mod = types.ModuleType("gradio")
    blocks_holder = {}

    def _blocks(*a, **k):
        b = _FakeBlocks()
        blocks_holder["b"] = b
        return b

    def _audio(*a, **k):
        a_ = _FakeAudio()
        blocks_holder["b"].audio = a_
        return a_

    def _button(*a, **k):
        btn = _FakeButton()
        blocks_holder["b"].button = btn
        return btn

    mod.Blocks = _blocks
    mod.Textbox = _FakeComponent
    mod.Audio = _audio
    mod.Button = _button
    monkeypatch.setitem(sys.modules, "gradio", mod)
    return blocks_holder


@pytest.fixture(scope="module")
def runner():
    cfg = tiny_test_config()
    cfg.decode.max_hyp_len = 32
    cfg.decode.n_steps = 4
    return ModelRunner(cfg)


def test_gradio_app_streams_and_resets(fake_gradio, runner):
    from conformer_tpu.serve.gradio_server import build_app

    demo = build_app(runner)
    blocks = fake_gradio["b"]
    assert demo is blocks
    transcribe = blocks.audio.stream_fn
    reset = blocks.button.click_fn
    assert transcribe is not None and reset is not None

    # live-microphone chunk: (sample_rate, int16 pcm) as gradio delivers it
    sr = 16000
    pcm = (
        np.sin(2 * np.pi * 300 * np.arange(sr // 2) / sr) * 12000
    ).astype(np.int16)
    out1 = transcribe((sr, pcm))
    assert isinstance(out1, str)
    # stereo + float chunk path
    stereo = np.stack([pcm, pcm], axis=1).astype(np.float32) / 32768.0
    out2 = transcribe((sr, stereo))
    assert isinstance(out2, str)
    # None chunk (gradio sends these on stream start)
    assert transcribe(None) == ""

    # Reset Model button: transcript clears, fresh session accumulated from
    assert reset() == ""
    out3 = transcribe((sr, pcm))
    assert isinstance(out3, str)
