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
            # the reference client polls with ?wait= (client.py:1324-1328)
            # — the query string must not corrupt the task-id lookup
            code, st = _get(f"{base}/v1/status/poll/{task_id}?wait=0.5")
            assert code == 200
            if st["task_status"] in ("success", "failure"):
                break
            time.sleep(0.1)
        assert st["task_status"] == "success"
        code, res = _get(f"{base}/v1/result/{task_id}")
        assert code == 200
        # batch shape: documents list + overall status + counts + timing
        assert res["status"] == "success"
        assert res["num_converted"] == 2 and res["num_succeeded"] == 2
        assert res["processing_time"] > 0
        docs = {d["filename"]: d for d in res["documents"]}
        assert docs["a.html"]["md_content"] == "# T\n\nbody"
        assert docs["a.html"]["status"] == "success"
        # json_content is an OBJECT (the client validates DoclingDocument)
        assert docs["a.html"]["json_content"][
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
            texts = [t["text"] for t in d["json_content"]["texts"]]
            assert want in texts
    finally:
        svc.shutdown()


def test_single_source_reference_envelope(spark):
    """One source → the reference's exact ConvertDocumentResponse shape
    (responses.py:270-279): singular required `document` holding
    `filename` (not `name`), top-level `status` + `processing_time`,
    `errors` list — the fields client.py:413-440 reads when rebuilding
    a ConversionResult."""
    from docling_spark.jobs.service import JobService

    svc = JobService(spark)
    try:
        tid = svc.submit({
            "sources": [{"name": "solo.html",
                         "payload": "<h1>Solo</h1><p>text</p>",
                         "tool": "html"}],
            "options": {"to_formats": ["md", "json"]},
        })
        for _ in range(300):
            if svc.status(tid)["task_status"] in ("success", "failure"):
                break
            time.sleep(0.05)
        res = svc.result(tid)
        assert set(res) == {"document", "status", "errors",
                            "processing_time"}
        assert res["status"] == "success"
        assert res["document"]["filename"] == "solo.html"
        assert res["document"]["md_content"] == "# Solo\n\ntext"
        assert res["document"]["json_content"][
            "schema_name"] == "DoclingDocument"
        assert res["errors"] == [] and res["processing_time"] > 0
    finally:
        svc.shutdown()


def test_bad_format_options_fail_task(spark):
    """A typo'd from_formats/to_formats must FAIL the task with a clear
    message, not silently produce an all-SKIPPED success (the CLI
    validates both; the service must too)."""
    from docling_spark.jobs.service import JobService

    svc = JobService(spark)
    try:
        for opts in ({"to_formats": ["markdwn"]},
                     {"from_formats": ["hmtl"]}):
            tid = svc.submit({
                "sources": [{"name": "a.html", "payload": "<h1>x</h1>",
                             "tool": "html"}],
                "options": opts,
            })
            for _ in range(300):
                if svc.status(tid)["task_status"] in ("success",
                                                      "failure"):
                    break
                time.sleep(0.05)
            assert svc.status(tid)["task_status"] == "failure"
            err = svc.result(tid)["error"]
            assert "unknown" in err and "format" in err
    finally:
        svc.shutdown()


def test_chunk_task_api(spark):
    """POST /v1/chunk/hybrid/source/async → poll → result with the
    reference's ChunkDocumentResponse shape (responses.py:308-311):
    chunks records + optional converted documents + processing_time;
    hierarchical kind = one chunk per item, no budget."""
    from docling_spark.jobs.service import serve

    server, service = serve(spark)
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{host}:{port}"
    try:
        resp = _post(f"{base}/v1/chunk/hybrid/source/async", {
            "sources": [{"name": "a.html",
                         "payload": "<h1>Head</h1><p>one two three"
                                    "</p><p>four five</p>",
                         "tool": "html"}],
            "chunking_options": {"max_tokens": 5},
            "include_converted_doc": True,
        })
        tid = resp["task_id"]
        for _ in range(300):
            _, st = _get(f"{base}/v1/status/poll/{tid}?wait=0.2")
            if st["task_status"] in ("success", "failure"):
                break
            time.sleep(0.05)
        assert st["task_status"] == "success"
        code, res = _get(f"{base}/v1/result/{tid}")
        assert code == 200
        assert set(res) == {"chunks", "documents", "processing_time"}
        # budget 5, head cost 1: "one two three"(3)+1 fits alone;
        # merge with "four five" needs 3+2+1=6 > 5 → two chunks
        assert [c["raw_text"] for c in res["chunks"]] == [
            "one two three", "four five"]
        assert res["chunks"][0]["filename"] == "a.html"
        assert res["chunks"][0]["headings"] == ["Head"]
        assert res["chunks"][0]["text"] == "Head\none two three"
        assert res["chunks"][0]["doc_items"][0].startswith("#/items/")
        assert res["documents"][0]["content"]["md_content"] \
            == "# Head\n\none two three\n\nfour five"

        # hierarchical: one chunk per item, never merged
        resp = _post(f"{base}/v1/chunk/hierarchical/source/async", {
            "sources": [{"name": "a.html",
                         "payload": "<h1>Head</h1><p>one two three"
                                    "</p><p>four five</p>",
                         "tool": "html"}],
        })
        tid = resp["task_id"]
        for _ in range(300):
            _, st = _get(f"{base}/v1/status/poll/{tid}")
            if st["task_status"] in ("success", "failure"):
                break
            time.sleep(0.05)
        code, res = _get(f"{base}/v1/result/{tid}")
        assert [c["raw_text"] for c in res["chunks"]] == [
            "one two three", "four five"]
        assert res["documents"] == []

        # unknown chunker kind → 404 at submission
        import urllib.error
        import urllib.request
        req = urllib.request.Request(
            f"{base}/v1/chunk/bogus/source/async", data=b"{}",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        service.shutdown()


def test_health_endpoint(spark):
    from docling_spark.jobs.service import serve

    server, service = serve(spark)
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        code, body = _get(f"http://{host}:{port}/health")
        assert code == 200 and body == {"status": "ok"}
    finally:
        server.shutdown()
        service.shutdown()


def test_chunk_task_validates_from_formats(spark):
    from docling_spark.jobs.service import JobService

    svc = JobService(spark)
    try:
        tid = svc.submit({
            "_task_kind": "chunk", "_chunker": "hybrid",
            "sources": [{"name": "a.html", "payload": "<h1>x</h1>",
                         "tool": "html"}],
            "convert_options": {"from_formats": ["hmtl"]},
        })
        for _ in range(300):
            if svc.status(tid)["task_status"] in ("success", "failure"):
                break
            time.sleep(0.05)
        assert svc.status(tid)["task_status"] == "failure"
        assert "unknown" in svc.result(tid)["error"]
    finally:
        svc.shutdown()
