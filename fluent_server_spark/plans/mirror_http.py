"""HTTP mirror read path — the reference serves its per-tag event map
as JSON over HTTP (mirror/mirror.go:41-47, log route mirror.go:27); here
the same face serves the CONSISTENT-SNAPSHOT mirror document
(TranscriptPipeline.mirror_json — per-sink aggregates + bounded ordered
event samples) and the checkpoint lineage, from a stdlib http.server in
a daemon thread.

Scale stance: this is a CONTROL-PLANE convenience (dashboards, smoke
checks), not a data path — `GET /mirror` triggers the bounded snapshot
queries (top-N per sink + tiny aggregates), never a full-table export.

Endpoints:
  GET /healthz  -> {"ok": true}
  GET /mirror   -> the mirror document (recomputed per request: bounded)
  GET /metrics  -> checkpoint lineage records (file read, no Spark)
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MirrorHttpServer:
    def __init__(
        self,
        pipeline,
        host: str = "127.0.0.1",
        port: int = 0,
        limit_per_sink: int = 100,
    ) -> None:
        self.pipeline = pipeline
        self.limit_per_sink = limit_per_sink
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, doc: str) -> None:
                body = doc.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:
                try:
                    if self.path == "/healthz":
                        self._send(200, '{"ok": true}')
                    elif self.path == "/mirror":
                        self._send(
                            200, outer.pipeline.mirror_json(outer.limit_per_sink)
                        )
                    elif self.path == "/metrics":
                        recs = []
                        with open(outer.pipeline.config.checkpoint_path) as f:
                            for line in f:
                                if line.strip():
                                    recs.append(json.loads(line))
                        self._send(200, json.dumps(recs))
                    else:
                        self._send(404, '{"error": "not found"}')
                except Exception as e:  # surface, don't kill the thread
                    self._send(500, json.dumps({"error": str(e)}))

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "MirrorHttpServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
