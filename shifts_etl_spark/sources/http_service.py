"""Paginated shifts API service — the engine's stand-in for the reference's
data-generator API (reference api/app/main.py:78-113): GET /api/shifts
?start=&limit= returns {results, links{base,prev,next}, start, limit, size}
with limit clamped to 1..30.

stdlib http.server only (the container has no web framework); threaded so
tests can run the real HTTP ingest path (sources/pages.iter_http_pages →
urllib) against it end-to-end.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .generator import generate_shift_docs


class ShiftsApiServer:
    def __init__(self, docs: list[dict] | None = None, default_limit: int = 7):
        self.docs = docs if docs is not None else generate_shift_docs()
        self.default_limit = default_limit
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def _page(self, start: int, limit: int) -> dict:
        limit = max(1, min(30, limit))
        start = max(0, start)
        chunk = self.docs[start : start + limit]
        links: dict = {"base": "/api/shifts"}
        if start > 0:
            links["prev"] = f"/api/shifts?start={max(0, start - limit)}&limit={limit}"
        if start + limit < len(self.docs):
            links["next"] = f"/api/shifts?start={start + limit}&limit={limit}"
        return {
            "results": chunk,
            "links": links,
            "start": start,
            "limit": limit,
            "size": len(self.docs),
        }

    def start(self, port: int = 0) -> str:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def do_GET(self):
                parsed = urlparse(self.path)
                if parsed.path != "/api/shifts":
                    self.send_error(404)
                    return
                q = parse_qs(parsed.query)
                try:
                    start = int(q.get("start", ["0"])[0])
                    limit = int(q.get("limit", [str(outer.default_limit)])[0])
                except ValueError:
                    self.send_error(400)
                    return
                body = json.dumps(outer._page(start, limit)).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        host, actual_port = self._httpd.server_address
        return f"http://{host}:{actual_port}/api/shifts"

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
