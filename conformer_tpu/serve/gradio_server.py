"""Gradio live-microphone demo (reference backend/gradio_server.py:13-42).

Gated on gradio being importable (not in this image); the same streaming
session API backs it.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..config import Config
from .runner import ModelRunner


def build_app(runner: ModelRunner):
    import gradio as gr

    state_holder = {"session": runner.new_session()}

    def transcribe(audio):
        if audio is None:
            return ""
        sr, wav = audio
        if wav.dtype != np.float32:
            wav = wav.astype(np.float32) / 32768.0
        if wav.ndim == 2:
            wav = wav.mean(axis=1)
        state_holder["session"], rec = runner.accept_chunk(
            state_holder["session"], wav, sr
        )
        return rec.text

    def reset():
        # reference "Reset Model" button -> init_state (gradio_server.py:36-37)
        state_holder["session"] = runner.new_session()
        return ""

    with gr.Blocks() as demo:
        out = gr.Textbox(label="transcript")
        mic = gr.Audio(sources=["microphone"], streaming=True)
        mic.stream(transcribe, inputs=mic, outputs=out)
        gr.Button("Reset Model").click(reset, outputs=out)
    return demo


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    cfg = Config.from_json_file(args.config) if args.config else Config()
    runner = ModelRunner(cfg, args.checkpoint)
    try:
        app = build_app(runner)
    except ImportError as e:
        raise SystemExit(f"gradio is not installed in this image: {e}")
    app.launch(server_port=args.port)


if __name__ == "__main__":
    main()
