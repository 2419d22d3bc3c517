"""HTTP job endpoint + thin client: the reference's deployment surface.

Reference parity (SURVEY.md §2 E1/E2): a client POSTs a JSON
MapReduceSpec to ``POST /mapreduce`` on the master
(cmd/master/http_server.go:30-58) and receives ``{"files": [...]}``;
the CLI also uploads UDF script directories and downloads outputs
(client/mrclient.go:59-198). Here the "master" is a stdlib HTTP server
wrapping ``mapreduce.submit_job`` over a shared SparkSession — all
scheduling/retry/heartbeat machinery the reference hand-rolls (D1, F1,
F2) is Spark's platform.

Spec JSON shape (mirrors client/mr_spec.json + upload_spec.json):
    {"input_paths": [...], "mapper": "path.py", "reducer": "path.py",
     "num_map_tasks": 20, "num_reduce_tasks": 5,
     "job_id": 123, "user_id": "u1", "output_dir": "/tmp/out"}
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from cloud_native_mapreduce_spark.mapreduce import MapReduceSpec, submit_job


def _spec_from_json(payload: dict) -> tuple[MapReduceSpec, str | None]:
    spec = MapReduceSpec(
        input_paths=tuple(payload["input_paths"]),
        mapper=payload["mapper"],
        reducer=payload["reducer"],
        num_map_tasks=int(payload.get("num_map_tasks", 8)),
        num_reduce_tasks=int(payload.get("num_reduce_tasks", 4)),
        job_id=int(payload.get("job_id", 0)),
        user_id=str(payload.get("user_id", "local")))
    return spec, payload.get("output_dir")


class JobServer:
    """Single-process job endpoint. ``start()`` binds an ephemeral (or
    given) port; jobs run on the wrapped SparkSession; ``stop()`` shuts
    the listener down. Thread-safe: ThreadingHTTPServer + Spark's own
    thread-safe session."""

    def __init__(self, spark: SparkSession, host: str = "127.0.0.1",
                 port: int = 0) -> None:
        self._spark = spark
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def do_POST(self) -> None:  # noqa: N802 - http.server contract
                if self.path != "/mapreduce":
                    self.send_error(404)
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(n))
                    spec, out_dir = _spec_from_json(payload)
                    files = submit_job(outer._spark, spec, out_dir)
                    body = json.dumps({"files": files}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                except Exception as exc:  # job errors → 500 + message
                    body = json.dumps({"error": str(exc)}).encode()
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "JobServer":
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def submit_http(endpoint: str, spec_payload: dict,
                timeout: float = 600.0) -> list[str]:
    """Client side: POST a job spec, return output file paths — the
    reference CLI's run path (client/mrclient.go:115-198) minus blob
    plumbing."""
    import urllib.request

    req = urllib.request.Request(
        f"{endpoint}/mapreduce",
        data=json.dumps(spec_payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        out = json.loads(resp.read())
    if "error" in out:
        raise RuntimeError(out["error"])
    return out["files"]
