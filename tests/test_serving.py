"""Serving: REST + WebSocket servers end-to-end over localhost."""

import asyncio
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from conformer_tpu.config import Config, tiny_test_config
from conformer_tpu.data import audio
from conformer_tpu.serve.rest_server import make_handler, parse_multipart
from conformer_tpu.serve.runner import ModelRunner


@pytest.fixture(scope="module")
def runner():
    cfg = tiny_test_config()
    cfg.decode.max_hyp_len = 32
    cfg.decode.n_steps = 4
    return ModelRunner(cfg)


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("wav")
    wav = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(
        np.float32
    )
    p = str(d / "a.wav")
    audio.save_wav(p, wav, 16000)
    return p


def test_parse_multipart():
    boundary = "XBOUND"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="audio"; filename="a.wav"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n"
        "PAYLOAD\r\n"
        f"--{boundary}--\r\n"
    ).encode()
    fields = parse_multipart(body, f'multipart/form-data; boundary={boundary}')
    assert fields == {"audio": b"PAYLOAD"}


def test_runner_recognize_file(runner, wav_path):
    rec = runner.recognize_file(wav_path)
    assert isinstance(rec.text, str)
    assert isinstance(rec.tokens, list)


def test_streaming_session_accumulates(runner):
    sr = 16000
    session = runner.new_session()
    wav = np.random.default_rng(0).standard_normal(sr).astype(np.float32) * 0.1
    session, rec1 = runner.accept_chunk(session, wav, sr)
    n1 = int(np.asarray(session.hyp_len)[0])
    session, rec2 = runner.accept_chunk(session, wav, sr)
    n2 = int(np.asarray(session.hyp_len)[0])
    assert n2 >= n1
    assert int(session.enc.offset[0]) > 0


def test_rest_server_roundtrip(runner, wav_path):
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(runner))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert json.load(r)["status"] == "ok"
        # raw-body recognize
        with open(wav_path, "rb") as f:
            data = f.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize/", data=data, method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert out["status"] == "success", out
        # multipart recognize
        boundary = "XB"
        body = (
            (
                f"--{boundary}\r\n"
                'Content-Disposition: form-data; name="audio"; filename="a.wav"\r\n'
                "\r\n"
            ).encode()
            + data
            + f"\r\n--{boundary}--\r\n".encode()
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize/",
            data=body,
            method="POST",
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert out["status"] == "success", out
        # bad payload -> fail status, not 500 (reference views.py:29-33)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize/", data=b"not audio", method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        assert out["status"] == "fail"
    finally:
        httpd.shutdown()


def test_websocket_server_protocol(runner):
    import websockets
    from conformer_tpu.serve.websocket_server import handle_connection

    async def scenario():
        async def handler(ws):
            await handle_connection(runner, ws)

        async with websockets.serve(handler, "127.0.0.1", 0) as server:
            port = server.sockets[0].getsockname()[1]
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                await ws.send(json.dumps({"signal": 1}))
                assert await ws.recv() == "$start$"
                pcm = (
                    np.random.default_rng(0).standard_normal(16000) * 3000
                ).astype(np.int16)
                await ws.send(pcm.tobytes())
                partial = await ws.recv()
                assert isinstance(partial, str)
                await ws.send(json.dumps({"signal": 0}))
                final = await ws.recv()
                assert final.startswith("$final$")

    asyncio.run(scenario())


def test_websocket_pooled_concurrent_streams(runner):
    """Two connections streaming at once through the scheduler-backed
    handler (micro-batched SessionPool) both complete the protocol."""
    import websockets
    from conformer_tpu.serve.websocket_server import handle_connection_pooled

    scheduler = runner.make_scheduler(n_slots=4, max_wait_ms=1.0)

    async def scenario():
        async def handler(ws):
            await handle_connection_pooled(runner, ws, scheduler)

        async with websockets.serve(handler, "127.0.0.1", 0) as server:
            port = server.sockets[0].getsockname()[1]

            async def client(seed):
                async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                    await ws.send(json.dumps({"signal": 1}))
                    assert await ws.recv() == "$start$"
                    pcm = (
                        np.random.default_rng(seed).standard_normal(16000)
                        * 3000
                    ).astype(np.int16)
                    for i in range(0, len(pcm), 4000):
                        await ws.send(pcm[i:i + 4000].tobytes())
                        assert isinstance(await ws.recv(), str)
                    await ws.send(json.dumps({"signal": 0}))
                    final = await ws.recv()
                    assert final.startswith("$final$")
                    return final

            finals = await asyncio.gather(client(0), client(1))
            assert len(finals) == 2

    try:
        asyncio.run(scenario())
    finally:
        scheduler.shutdown()


def test_websocket_poisoned_frame_reports_fail(runner):
    """A frame that makes decode raise must produce a {"status":"fail"}
    error frame (not a silent close), and the connection must survive
    (VERDICT r3 weak #5; protocol precedent: reference views.py:29-33)."""
    import websockets
    from conformer_tpu.serve.websocket_server import handle_connection

    async def scenario():
        async def handler(ws):
            await handle_connection(runner, ws)

        async with websockets.serve(handler, "127.0.0.1", 0) as server:
            port = server.sockets[0].getsockname()[1]
            async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
                await ws.send(json.dumps({"signal": 1}))
                assert await ws.recv() == "$start$"
                # odd-length buffer: np.frombuffer(int16) raises ValueError
                await ws.send(b"\x00")
                reply = json.loads(await ws.recv())
                assert reply["status"] == "fail"
                assert "ValueError" in reply["message"]
                # connection still alive: a valid chunk decodes normally
                pcm = (
                    np.random.default_rng(1).standard_normal(16000) * 3000
                ).astype(np.int16)
                await ws.send(pcm.tobytes())
                assert isinstance(await ws.recv(), str)
                await ws.send(json.dumps({"signal": 0}))
                assert (await ws.recv()).startswith("$final$")

    asyncio.run(scenario())
