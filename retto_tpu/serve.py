"""HTTP serving front end with per-stage streaming.

Fills the slot of the reference's wasm/TS binding (retto-wasm/src +
fe/index.ts — SURVEY.md §2 rows 16-17: browser target out of scope, a
serve-style streaming API covers the use case).  The wire contract is the
TS wrapper's: per-stage events ``{"stage": "det"|"cls"|"rec", "result":
...}`` (fe/index.ts:44-56), streamed as NDJSON.

Endpoints (stdlib http.server; no extra deps):
    POST /ocr         -> full OcrResult JSON
    POST /ocr/stream  -> NDJSON stage events (det, cls, rec)
    GET  /healthz     -> {"ok": true}
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .errors import RettoError

logger = logging.getLogger("retto_tpu.serve")

__all__ = ["make_server", "serve"]


def make_handler(session, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            logger.debug(fmt, *args)

        def _send(self, code: int, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b'{"ok": true}')
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            if not data:
                self._send(400, b'{"error": "empty body"}')
                return
            try:
                if self.path == "/ocr":
                    with lock:  # jit caches are not re-entrant-safe per shape
                        res = session.run(data)
                    self._send(
                        200, res.to_json().encode("utf-8")
                    )
                elif self.path == "/ocr/stream":
                    self.send_response(200)
                    self.send_header("Content-Type", "application/x-ndjson")
                    self.end_headers()

                    def cb(stage):
                        line = json.dumps(
                            stage.to_dict(), ensure_ascii=False
                        ) + "\n"
                        self.wfile.write(line.encode("utf-8"))
                        self.wfile.flush()

                    with lock:
                        session.run_stream(data, cb)
                else:
                    self._send(404, b'{"error": "not found"}')
            except RettoError as e:
                self._send(
                    422,
                    json.dumps({"error": str(e)}).encode("utf-8"),
                )
            except Exception as e:  # noqa: BLE001
                logger.exception("serve error")
                self._send(
                    500, json.dumps({"error": str(e)}).encode("utf-8")
                )

    return Handler


def make_server(session, host: str = "127.0.0.1", port: int = 8471):
    lock = threading.Lock()
    return ThreadingHTTPServer((host, port), make_handler(session, lock))


def serve(session, host: str = "127.0.0.1", port: int = 8471) -> None:
    srv = make_server(session, host, port)
    logger.info("retto serving on %s:%d", host, port)
    try:
        srv.serve_forever()
    finally:
        srv.server_close()
