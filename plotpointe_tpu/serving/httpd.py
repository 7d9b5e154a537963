"""Dependency-free HTTP serving surface (stdlib http.server).

Endpoint-for-endpoint parity with the FastAPI app (`serving/app.py` here and
`serving/app.py:51-71` in the reference): GET /healthz, POST /startup,
POST /recommend {item_ids, k} -> {indices, scores}. Exists because the core
image may not ship fastapi/uvicorn; the FastAPI app remains the full-featured
surface when those are installed.
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from plotpointe_tpu.serving.runtime import RecommenderRuntime, ServingConfig


class _Handler(BaseHTTPRequestHandler):
    server_version = "plotpointe-tpu/0.1"

    def _send(self, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def do_GET(self):
        if self.path == "/healthz":
            self._send(200, {"status": "ok"})
        else:
            self._send(404, {"detail": "not found"})

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError):
            self._send(400, {"detail": "invalid JSON body"})
            return

        if self.path == "/startup":
            try:
                cfg = ServingConfig(
                    item_embeddings_uri=payload["item_embeddings_uri"],
                    item_index_map_uri=payload.get("item_index_map_uri"),
                    topk=int(payload.get("topk", 20)),
                    project_id=payload.get("project_id"),
                    use_device=bool(payload.get("use_device", True)),
                )
            except KeyError as e:
                self._send(400, {"detail": f"missing field: {e}"})
                return
            rt = RecommenderRuntime(cfg)
            try:
                rt.startup()
            except FileNotFoundError as e:
                self._send(400, {"detail": str(e)})
                return
            self.server.runtime = rt  # type: ignore[attr-defined]
            self._send(200, {"status": "ok"})
        elif self.path == "/recommend":
            rt: Optional[RecommenderRuntime] = getattr(self.server, "runtime", None)
            if rt is None:
                self._send(503, {"detail": "Model not loaded. Call /startup or set env."})
                return
            item_ids = payload.get("item_ids")
            if not item_ids:
                self._send(400, {"detail": "item_ids required"})
                return
            import time as _time

            t0 = _time.perf_counter()
            try:
                idx, scores = rt.top_k_for_user_items([int(x) for x in item_ids], k=payload.get("k"))
            except (IndexError, ValueError) as e:
                self._send(400, {"detail": f"bad item_ids: {e}"})
                return
            latency_ms = (_time.perf_counter() - t0) * 1000.0
            body = {"indices": idx.tolist(), "scores": [float(x) for x in scores.tolist()]}
            telemetry = getattr(self.server, "telemetry", None)
            if telemetry is not None:
                body["request_id"] = telemetry.log_request(
                    body["indices"], body["scores"], latency_ms, user_key=payload.get("user_key")
                )
            self._send(200, body)
        elif self.path == "/feedback":
            telemetry = getattr(self.server, "telemetry", None)
            if telemetry is None:
                self._send(503, {"detail": "telemetry not enabled"})
                return
            try:
                telemetry.log_feedback(
                    request_id=payload["request_id"],
                    item_id=int(payload["item_id"]),
                    event_type=str(payload.get("event_type", "click")),
                    value=float(payload.get("value", 1.0)),
                    user_key=payload.get("user_key"),
                )
            except KeyError as e:
                self._send(400, {"detail": f"missing field: {e}"})
                return
            self._send(200, {"status": "ok"})
        else:
            self._send(404, {"detail": "not found"})


def serve(
    host: str = "0.0.0.0",
    port: int = 8080,
    runtime: Optional[RecommenderRuntime] = None,
    telemetry=None,
    block: bool = True,
):
    """Start the server. Returns (server, thread) when block=False."""
    httpd = ThreadingHTTPServer((host, port), _Handler)
    httpd.runtime = runtime  # type: ignore[attr-defined]
    httpd.telemetry = telemetry  # type: ignore[attr-defined]
    if block:
        httpd.serve_forever()
        return httpd, None
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, t
