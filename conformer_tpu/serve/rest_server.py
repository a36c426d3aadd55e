"""REST recognition server (stdlib http.server; no Django dependency).

Protocol-compatible rebuild of the reference endpoint (SURVEY.md §3.4,
backend/endpoints/views.py:15-34 + backend/server/urls.py:20-22):

    POST /recognize/   multipart form field "audio" (or raw wav body)
    -> {"status": "success", "message": "<transcript>"}
    errors -> {"status": "fail", "message": "..."}   (views.py:29-33)

Also serves GET /health. Threaded: concurrent requests share the read-only
params; decode calls serialize on the runner's lock.

Usage:
    python -m conformer_tpu.serve.rest_server --config cfg.json \
        --checkpoint experiments/run1 --port 9000
"""

from __future__ import annotations

import argparse
import json
import re
import tempfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..config import Config
from .runner import ModelRunner


def parse_multipart(body: bytes, content_type: str) -> dict[str, bytes]:
    """Minimal multipart/form-data parser (cgi was removed in py3.12)."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return {}
    boundary = ("--" + m.group(1)).encode()
    fields: dict[str, bytes] = {}
    for part in body.split(boundary):
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        header_blob, _, content = part.partition(b"\r\n\r\n")
        name_m = re.search(rb'name="([^"]+)"', header_blob)
        if name_m:
            fields[name_m.group(1).decode()] = content.rstrip(b"\r\n")
    return fields


def make_handler(runner: ModelRunner):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802
            if self.path.rstrip("/") in ("", "/health"):
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"status": "fail", "message": "not found"})

        def do_POST(self):  # noqa: N802
            if self.path.rstrip("/") != "/recognize":
                self._send(404, {"status": "fail", "message": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("multipart/form-data"):
                    fields = parse_multipart(body, ctype)
                    audio = fields.get("audio")
                    if audio is None:
                        raise ValueError("missing form field 'audio'")
                else:
                    audio = body
                with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                    f.write(audio)
                    f.flush()
                    rec = runner.recognize_file(f.name)
                self._send(200, {"status": "success", "message": rec.text})
            except Exception as e:  # noqa: BLE001 (views.py:29-33 catches all)
                self._send(200, {"status": "fail", "message": str(e)})

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(runner: ModelRunner, host: str = "0.0.0.0", port: int = 9000):
    httpd = ThreadingHTTPServer((host, port), make_handler(runner))
    print(f"REST server on http://{host}:{port}/recognize/")
    httpd.serve_forever()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=9000)
    args = ap.parse_args()
    cfg = Config.from_json_file(args.config) if args.config else Config()
    serve(ModelRunner(cfg, args.checkpoint), args.host, args.port)


if __name__ == "__main__":
    main()
