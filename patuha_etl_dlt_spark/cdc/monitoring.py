"""Health endpoint — the reference's HTTP :8089 monitor re-expressed.

Reference: ``/root/reference/source/monitoring.py:16-152`` serves a JSON
health document (status + timestamp + connectivity) from a tiny stdlib
HTTP server thread. Here the payload is ``SyncOrchestrator.status()``
(last-commit age, per-partition offsets, lag/throughput from the metrics
log); the server is the same stdlib pattern: a daemon thread, JSON on
``GET /``, 404 elsewhere. There is nothing Spark-specific to serve —
the orchestrator state lives driver-side by design.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer


class HealthServer:
    """Serve ``status_fn()`` as JSON on ``GET /`` from a daemon thread.

    >>> hs = HealthServer(orchestrator.status, port=8089).start()
    >>> ... ; hs.stop()
    """

    def __init__(self, status_fn, host: str = "127.0.0.1", port: int = 8089):
        self.status_fn = status_fn
        self.host = host
        self.port = port
        self._server: HTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "HealthServer":
        status_fn = self.status_fn

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                if self.path != "/":
                    self.send_error(404)
                    return
                try:
                    body = json.dumps(status_fn()).encode()
                    code = 200
                except Exception as e:  # noqa: BLE001 — degrade, don't die
                    body = json.dumps({"status": "error", "error": str(e)}).encode()
                    code = 500
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self._server = HTTPServer((self.host, self.port), Handler)
        self.port = self._server.server_port  # resolves port=0 → ephemeral
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()
            self._server.server_close()
