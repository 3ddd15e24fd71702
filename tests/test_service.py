"""HTTP job service (jobs/service.py): the docling-serve task-API analog
— submit → poll → result over real HTTP, one shared Spark session."""

from __future__ import annotations

import json
import threading
import time
import urllib.request


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _get(url, ok_codes=(200,)):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_submit_poll_result_roundtrip(spark):
    from docling_spark.jobs.service import serve

    server, service = serve(spark)
    host, port = server.server_address
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{host}:{port}"
    try:
        resp = _post(f"{base}/v1/convert/source/async", {
            "sources": [
                {"name": "a.html", "payload": "<h1>T</h1><p>body</p>",
                 "tool": "html"},
                {"name": "b.md", "payload": "# H\n\npara", "tool": "md"},
            ],
            "options": {"to_formats": ["md", "json", "doctags"]},
        })
        task_id = resp["task_id"]
        assert resp["task_status"] == "pending"
        for _ in range(300):
            code, st = _get(f"{base}/v1/status/poll/{task_id}")
            assert code == 200
            if st["task_status"] in ("success", "failure"):
                break
            time.sleep(0.1)
        assert st["task_status"] == "success"
        code, res = _get(f"{base}/v1/result/{task_id}")
        assert code == 200
        docs = {d["name"]: d for d in res["documents"]}
        assert docs["a.html"]["md_content"] == "# T\n\nbody"
        assert docs["a.html"]["status"] == "success"
        assert json.loads(docs["a.html"]["json_content"])[
            "schema_name"] == "DoclingDocument"
        assert "<doctag>" in docs["b.md"]["doctags_content"]
    finally:
        server.shutdown()
        service.shutdown()


def test_service_error_paths(spark):
    from docling_spark.jobs.service import serve

    server, service = serve(spark)
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{host}:{port}"
    try:
        # unknown task / unfinished task / bad route / bad body
        code, _ = _get(f"{base}/v1/status/poll/nope")
        assert code == 404
        code, _ = _get(f"{base}/v1/result/nope")
        assert code == 404
        code, _ = _get(f"{base}/v1/bogus")
        assert code == 404
        req = urllib.request.Request(
            f"{base}/v1/convert/source/async", data=b"{not json",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # empty sources -> task reaches failure, error surfaced
        resp = _post(f"{base}/v1/convert/source/async", {"sources": []})
        tid = resp["task_id"]
        for _ in range(300):
            _, st = _get(f"{base}/v1/status/poll/{tid}")
            if st["task_status"] in ("success", "failure"):
                break
            time.sleep(0.05)
        assert st["task_status"] == "failure"
        code, res = _get(f"{base}/v1/result/{tid}")
        assert code == 200 and "error" in res
    finally:
        server.shutdown()
        service.shutdown()


def test_duplicate_names_stay_distinct(spark):
    """Two sources sharing a name must produce exactly two documents,
    each pairing its OWN md with its OWN json (the name-keyed join
    cross-multiplied them before the uid fix)."""
    from docling_spark.jobs.service import JobService

    svc = JobService(spark)
    try:
        tid = svc.submit({
            "sources": [
                {"name": "doc", "payload": "<h1>A</h1>", "tool": "html"},
                {"name": "doc", "payload": "<h1>B</h1>", "tool": "html"},
            ],
            "options": {"to_formats": ["md", "json"]},
        })
        for _ in range(300):
            if svc.status(tid)["task_status"] in ("success", "failure"):
                break
            time.sleep(0.1)
        res = svc.result(tid)
        docs = res["documents"]
        assert len(docs) == 2
        assert sorted(d["md_content"] for d in docs) == ["# A", "# B"]
        for d in docs:
            want = d["md_content"].lstrip("# ")
            assert f'"{want}"' in d["json_content"]
    finally:
        svc.shutdown()
