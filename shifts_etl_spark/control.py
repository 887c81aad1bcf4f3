"""HTTP control surface — parity with the reference's two FastAPI
endpoints (reference etl/app/main.py:31-67):

  POST /run-etl[?batch_size=N]   N in [1, 30] = page size passed to the
                                 shifts API as ``limit`` (the reference
                                 appends it to API_URL the same way)
  POST /clear-data

Same response contract: 200 ``{"status": "ETL process completed
successfully"}`` / ``{"status": "Data cleared successfully"}``, 400 for
validation failures (the reference's ValueError branch — here
quality.IntegrityError and bad query params too), 500 for everything
else. Stdlib ``http.server`` only — the engine adds no web-framework
dependency; the ETL itself runs on the driver exactly as the CLI path
does, so the endpoint is a thin trigger, not a data path.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from . import pipeline
from .operators.quality import IntegrityError


class EtlControlServer:
    """Serves /run-etl and /clear-data over a SparkSession.

    ``api_url`` points at the paginated shifts feed (e.g. a
    sources.http_service.ShiftsApiServer); ``fetch`` is injectable for
    tests, mirroring pipeline.run_etl."""

    def __init__(
        self,
        spark: SparkSession,
        api_url: str,
        output_dir: str,
        anchor_date=None,
        fetch=None,
    ):
        self.spark = spark
        self.api_url = api_url
        self.output_dir = output_dir
        self.anchor_date = anchor_date
        self.fetch = fetch
        self._httpd: ThreadingHTTPServer | None = None

    # -- endpoint bodies ---------------------------------------------------

    def _run_etl(self, batch_size: int | None) -> dict:
        url = self.api_url
        if batch_size is not None:
            sep = "&" if urlparse(url).query else "?"
            url = f"{url}{sep}limit={batch_size}"
        counts = pipeline.run_etl(
            self.spark,
            api_url=url,
            output_dir=self.output_dir,
            anchor_date=self.anchor_date,
            fetch=self.fetch,
        )
        return {"status": "ETL process completed successfully", "counts": counts}

    def _clear_data(self) -> dict:
        pipeline.clear_data(self.output_dir)
        return {"status": "Data cleared successfully"}

    # -- http plumbing -----------------------------------------------------

    def start(self, port: int = 0) -> str:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _reply(self, code: int, body: dict):
                data = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_POST(self):
                u = urlparse(self.path)
                try:
                    if u.path == "/run-etl":
                        q = parse_qs(u.query)
                        batch = None
                        if "batch_size" in q:
                            batch = int(q["batch_size"][0])
                            if not 1 <= batch <= 30:
                                raise ValueError(
                                    "batch_size must be between 1 and 30"
                                )
                        self._reply(200, outer._run_etl(batch))
                    elif u.path == "/clear-data":
                        self._reply(200, outer._clear_data())
                    else:
                        self._reply(404, {"detail": "Not Found"})
                except (ValueError, IntegrityError) as e:
                    self._reply(400, {"detail": str(e)})
                except Exception as e:  # noqa: BLE001 — 500 contract
                    self._reply(500, {"detail": f"ETL process failed: {e}"})

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return f"http://127.0.0.1:{self._httpd.server_address[1]}"

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
