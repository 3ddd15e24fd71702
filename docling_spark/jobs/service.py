"""HTTP job service — the control-plane analog of docling-serve's task
API, which the reference's ``docling convert-remote`` CLI drives
(docling/service_client/client.py: POST /v1/convert/source/async →
task_id, GET /v1/status/poll/<task_id>, GET /v1/result/<task_id>;
``task_status`` terminal values ``success``/``failure`` per
docling/service_client/job.py).

Stdlib-only (ThreadingHTTPServer) over ONE shared SparkSession: a POST
enqueues the payload batch, a single worker thread runs the same
Arrow-batched extraction kernel and export sinks as the table job and
the CLI, and clients poll status then fetch results. The single worker
keeps Spark scheduling deterministic and mirrors docling-serve's
default one-task-at-a-time engine loop.

Request body (JSON)::

    {"sources": [{"name": "a.html", "payload": "<h1>T</h1>",
                  "b64": false, "tool": "html"}, ...],
     "options": {"to_formats": ["md", "json"],
                 "from_formats": ["html"],          # optional allow-list
                 "pdf_passwords": ["1234"]}}        # optional

Result body: ``{"documents": [{"name", "status", "format",
"md_content", "<fmt>_content"...}]}`` — the md/json content-field
naming the reference client reads (client.py:424).
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_ITEM_FORMATS = ("json", "yaml", "doctags", "itxt", "html",
                 "html_split_page", "doclang", "dclx")

TERMINAL = ("success", "failure")


class JobService:
    """Task store + single Spark worker. Start/stop from the host
    process (spark-submit driver or a test)."""

    # terminal tasks beyond this count are evicted oldest-first — the
    # mirrored docling-serve API also expires results; without a bound a
    # long-running service accumulates every request payload and result
    MAX_TERMINAL_TASKS = 100

    def __init__(self, spark):
        self.spark = spark
        self.tasks: dict[str, dict] = {}
        self._terminal_order: list[str] = []
        self._q: "queue.Queue[str]" = queue.Queue()
        self._lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._stop = False
        self._worker.start()

    def submit(self, body: dict) -> str:
        task_id = uuid.uuid4().hex
        with self._lock:
            self.tasks[task_id] = {"task_status": "pending",
                                   "request": body, "result": None,
                                   "error": None}
        self._q.put(task_id)
        return task_id

    def status(self, task_id: str) -> dict | None:
        with self._lock:
            t = self.tasks.get(task_id)
            if t is None:
                return None
            return {"task_id": task_id, "task_status": t["task_status"]}

    def result(self, task_id: str) -> dict | None:
        with self._lock:
            t = self.tasks.get(task_id)
            if t is None or t["task_status"] not in TERMINAL:
                return None
            if t["task_status"] == "failure":
                return {"error": t["error"] or "conversion failed"}
            return t["result"]

    def shutdown(self):
        self._stop = True
        self._q.put("")  # unblock

    # ------------------------------------------------------------ worker

    def _run(self):
        while not self._stop:
            task_id = self._q.get()
            if not task_id:
                continue
            try:
                result = self._convert(self.tasks[task_id]["request"])
                with self._lock:
                    self.tasks[task_id]["result"] = result
                    self.tasks[task_id]["task_status"] = "success"
            except Exception as exc:  # contained: one bad task, not the loop
                with self._lock:
                    self.tasks[task_id]["error"] = f"{type(exc).__name__}: {exc}"
                    self.tasks[task_id]["task_status"] = "failure"
            with self._lock:
                self.tasks[task_id]["request"] = None  # payload no longer needed
                self._terminal_order.append(task_id)
                while len(self._terminal_order) > self.MAX_TERMINAL_TASKS:
                    old = self._terminal_order.pop(0)
                    self.tasks.pop(old, None)

    def _convert(self, body: dict) -> dict:
        from pyspark.sql import functions as F

        from docling_spark.operators.export import export_items
        from docling_spark.operators.extract_ops import extract_turns

        sources = body.get("sources") or []
        if not sources:
            raise ValueError("no sources")
        opts = body.get("options") or {}
        to_formats = opts.get("to_formats") or ["md"]
        allowed = opts.get("from_formats")
        pw = tuple(opts.get("pdf_passwords") or ())
        rows = []
        names = []
        for i, s in enumerate(sources):
            payload = s.get("payload")
            if s.get("b64"):
                # travel base64 exactly like binary table payloads — the
                # engine's sniffers accept the b64 spelling natively
                payload = payload if isinstance(payload, str) else \
                    base64.b64encode(payload).decode("ascii")
            names.append(s.get("name") or f"doc_{i}")
            # conv_id = the batch INDEX, not the client-supplied name:
            # two sources sharing a name would cross-multiply the
            # per-format export joins (2 duplicate names x 2 sinks ->
            # 4 rows mixing one document's md with the other's json)
            rows.append((str(i), 0, "user", payload, s.get("tool") or ""))
        df = self.spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "text string, tool string")
        extracted = extract_turns(
            df, pdf_passwords=pw,
            allowed_formats=frozenset(allowed) if allowed else None).cache()
        try:
            plan = extracted.select(
                F.col("conv_id").alias("uid"), "status", "format",
                "extracted_text")
            for fmt in [f for f in to_formats if f in _ITEM_FORMATS]:
                ser = export_items(
                    extracted.select(F.col("conv_id").alias("uid"),
                                     "items"),
                    fmt=fmt, keep_cols=("uid",))
                plan = plan.join(ser, "uid", "left")
            docs: list[dict | None] = [None] * len(names)
            for row in plan.toLocalIterator():
                idx = int(row["uid"])
                d = {"name": names[idx], "status": row["status"],
                     "format": row["format"]}
                for fmt in to_formats:
                    if fmt in ("md", "text"):
                        d[f"{fmt}_content"] = row["extracted_text"]
                    elif fmt in _ITEM_FORMATS:
                        d[f"{fmt}_content"] = row[fmt]
                docs[idx] = d
            return {"documents": [d for d in docs if d is not None]}
        finally:
            extracted.unpersist()


def make_handler(service: JobService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            if self.path != "/v1/convert/source/async":
                self._send(404, {"detail": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length") or 0)
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._send(400, {"detail": "invalid JSON body"})
                return
            task_id = service.submit(body)
            self._send(200, {"task_id": task_id,
                             "task_status": "pending"})

        def do_GET(self):
            if self.path.startswith("/v1/status/poll/"):
                st = service.status(self.path.rsplit("/", 1)[1])
                if st is None:
                    self._send(404, {"detail": "unknown task"})
                else:
                    self._send(200, st)
                return
            if self.path.startswith("/v1/result/"):
                res = service.result(self.path.rsplit("/", 1)[1])
                if res is None:
                    self._send(404, {"detail": "task not finished"})
                else:
                    self._send(200, res)
                return
            self._send(404, {"detail": "not found"})

    return Handler


def serve(spark, host: str = "127.0.0.1", port: int = 0):
    """Returns (server, service); run ``server.serve_forever()`` (or in a
    thread) and ``server.server_address`` for the bound port."""
    service = JobService(spark)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    return server, service


def main(argv=None) -> int:  # pragma: no cover — long-running entry
    import argparse

    from pyspark.sql import SparkSession

    p = argparse.ArgumentParser(description="docling-spark job service")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=5001)
    args = p.parse_args(argv)
    spark = (SparkSession.builder.appName("docling-spark-serve")
             .getOrCreate())
    server, _ = serve(spark, args.host, args.port)
    print(f"serving on {server.server_address}")
    server.serve_forever()
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
