"""Round-2 regression tests: VERDICT "What's wrong" + ADVICE fixes.

Each test pins one of the r1 findings:
- fixed_token_chunks no longer drops docs with 0 < n_tokens <= overlap
- budget_chunks keys sections by heading item_idx, not heading text
- connected_components converges on long chains (pointer jumping) and
  raises on genuine non-convergence
- cosine_pairs_lsh (the new contract plan) against the exact n² oracle
- emailx raw-payload body fallback
- export_items derives keep-column types from the input schema
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- chunker

def test_short_doc_survives_overlap(spark):
    from docling_spark.operators.chunker import fixed_token_chunks

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y"), (3, "")],
        "doc_id long, text string",
    )
    out = fixed_token_chunks(docs, chunk_tokens=16, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 8-token doc used to vanish (n - overlap <= 0 → zero chunks)
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "a b c d e f g h"
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "x y"
    assert 3 not in by_doc  # empty doc still yields nothing


def test_fixed_chunks_overlap_windows(spark):
    from docling_spark.operators.chunker import fixed_token_chunks

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id long, text string"
    )
    rows = sorted(
        fixed_token_chunks(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_text for r in rows] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9",
    ]


def test_budget_chunks_duplicate_headings_pack_independently(spark):
    from docling_spark.operators.chunker import budget_chunks

    # two sections whose headings read identically; text-keyed grouping
    # used to interleave their items into shared bins
    items = spark.createDataFrame(
        [
            (1, 0, "section_header", "Intro", "body"),
            (1, 1, "text", "a1 a2 a3", "body"),
            (1, 2, "text", "a4 a5 a6", "body"),
            (1, 3, "section_header", "Intro", "body"),
            (1, 4, "text", "b1 b2 b3", "body"),
            (1, 5, "text", "b4 b5 b6", "body"),
        ],
        "doc_id long, item_idx int, label string, text string, content_layer string",
    )
    rows = budget_chunks(items, max_tokens=6).collect()
    got = {(r.heading_idx, r.chunk_id): r.chunk_text for r in rows}
    assert got == {
        (0, 0): "a1 a2 a3 a4 a5 a6",
        (3, 0): "b1 b2 b3 b4 b5 b6",
    }


# ------------------------------------------------- connected components

def test_connected_components_long_chain_converges(spark):
    from docling_spark.operators.dedup import connected_components

    # a 120-node chain: min-label alone needs ~120 rounds; pointer
    # jumping must land it well inside max_iter=10
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "doc_a long, doc_b long"
    )
    labels = connected_components(pairs, max_iter=10).collect()
    assert len(labels) == 121
    assert {r.component for r in labels} == {0}


def test_connected_components_strict_raises(spark):
    from docling_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=2, strict=True)
    # non-strict path still returns labels (possibly split)
    out = connected_components(pairs, max_iter=2, strict=False).collect()
    assert len(out) == 41


def test_connected_components_two_clusters(spark):
    from docling_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


# ------------------------------------------------------- similarity LSH

def test_cosine_pairs_lsh_subset_and_recall(spark, sf_dir):
    """The LSH-gated plan returns a SUBSET of the exact n² pairs with
    identical scores, and decent recall at the contract threshold."""
    from docling_spark.operators.similarity import cosine_pairs, cosine_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cos
        for r in cosine_pairs(emb, threshold=0.45).collect()
    }
    gated = {
        (r.id_a, r.id_b): r.cos
        for r in cosine_pairs_lsh(emb, threshold=0.45, dim=64).collect()
    }
    assert set(gated) <= set(exact)
    for k, v in gated.items():
        assert v == exact[k]
    if exact:
        recall = len(gated) / len(exact)
        assert recall >= 0.4, f"recall {recall:.2f} below floor"


def test_cosine_pairs_lsh_no_nested_loop_join(spark, sf_dir):
    from docling_spark.operators.similarity import cosine_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = cosine_pairs_lsh(emb, threshold=0.45, dim=64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------------- email/export

def test_email_raw_body_fallback(spark):
    from docling_spark.engine.emailx import extract_email

    raw = (
        "From: a@example.com\r\n"
        "To: b@example.com\r\n"
        "Subject: odd type\r\n"
        "Content-Type: application/x-custom\r\n"
        "\r\n"
        "first paragraph body\r\n\r\nsecond paragraph\r\n"
    )
    md, items, _metrics = extract_email(raw)
    assert "first paragraph body" in md
    assert "second paragraph" in md


def test_export_items_string_keep_cols(spark):
    from docling_spark.operators.export import export_items
    from docling_spark.operators.extract_ops import extract_turns

    d = spark.createDataFrame(
        [("c1", 0, "user", None, "<html><body><p>hi</p></body></html>", "html")],
        "conv_id string, turn_idx int, role string, ts timestamp, "
        "text string, tool string",
    )
    out = export_items(
        extract_turns(d), fmt="doctags", keep_cols=("conv_id", "role")
    ).collect()
    # role is a string col — the old name-based heuristic typed it int and
    # crashed in Arrow; schema-derived typing keeps it
    assert out[0].role == "user" and out[0].conv_id == "c1"
    assert "<doctag>" in out[0].doctags or out[0].doctags


# ------------------------------------------------------- assembly bound

def test_assemble_two_level_matches_single_level(spark):
    from docling_spark.operators.extract_ops import assemble_conversations

    rows = [("c%d" % (i % 3), i // 3, "t%03d" % i, "success") for i in range(60)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, extracted_text string, status string"
    )
    # tiny segment size forces multi-segment folding; result must equal
    # the naive order-joined text
    out = {r.conv_id: r for r in
           assemble_conversations(df, segment_size=4).collect()}
    for c in ("c0", "c1", "c2"):
        expect = "\n\n".join(
            t for (cv, _ti, t, _s) in sorted(rows, key=lambda x: x[1])
            if cv == c
        )
        assert out[c].conversation_text == expect
        assert out[c].n_turns == 20
        assert out[c].n_success == 20


def test_vocab_topk_no_global_window_exchange(spark):
    from docling_spark.operators.textstats import vocab_topk

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha " + ("beta" if i % 2 else "delta"))
         for i in range(50)],
        "doc_id long, text string",
    )
    out = vocab_topk(docs, k=3)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.token for r in rows] == ["alpha", "beta", "gamma"]
    assert rows[0].n == 100
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the top-k must ride TakeOrderedAndProject, not a global sort of the
    # whole vocabulary into one partition
    assert "TakeOrderedAndProject" in plan


# --- engine review fixes (round 2, third sweep) ---------------------------


def test_footer_first_heading_does_not_eat_document():
    """A first heading inside a <footer> must not consume the
    furniture→body switch: every heading sets body
    (html_backend.py:2161), the footer restores around its subtree."""
    from docling_spark.engine.htmlx import extract_html

    t, items = extract_html(
        "<body><footer><h2>Footer nav</h2></footer>"
        "<h1>Main Title</h1><p>real content here</p></body>")
    assert "Main Title" in t and "real content here" in t


def test_list_spans_skip_image_lines():
    """Span assignment pairs items with the lines they rendered; image /
    caption lines and no-line items must not shift the zip."""
    from docling_spark.engine.htmlx import extract_html

    t, items = extract_html(
        '<h1>T</h1><ul><li><img alt="pic caption"></li>'
        "<li>hello world</li></ul>")
    li = [it for it in items
          if it["label"] == "list_item" and it["text"] == "hello world"][0]
    assert t[li["span_start"]:li["span_end"]] == "hello world"


def test_ruled_tables_band_split():
    """A footnote separator rule far below a table must not extend the
    grid and swallow the body text in between."""
    from docling_spark.engine.pdfx import detect_ruled_tables

    class R:
        def __init__(s, x, y, w, text):
            s.x, s.y, s.w, s.text, s.size, s.page_no = x, y, w, text, 10.0, 1

    rules = [
        (50, 740, 550, 740), (50, 720, 550, 720), (50, 700, 550, 700),
        (50, 740, 50, 700), (300, 740, 300, 700), (550, 740, 550, 700),
        (50, 100, 550, 100),  # footnote separator, 600pt away
    ]
    runs = [R(60, 728, 100, "cell a"), R(310, 728, 100, "cell b"),
            R(60, 708, 100, "cell c"), R(310, 708, 100, "cell d"),
            R(60, 400, 300, "body paragraph text")]
    cells, consumed = detect_ruled_tables(rules, runs, 792.0)
    assert 4 not in consumed  # the paragraph stays body text
    assert sorted(c["text"] for c in cells) == \
        ["cell a", "cell b", "cell c", "cell d"]


def test_dedup_cells_grouped_by_page():
    """Page grouping: identical bboxes on different pages never dedup;
    same-page overlaps still do."""
    from docling_spark.engine.layoutx import dedup_cells

    mk = lambda page, conf: {"page_no": page, "bbox": (0, 0, 10, 10),
                             "conf": conf, "label": "text", "text": "x"}
    out = dedup_cells([mk(1, 0.9), mk(2, 0.9), mk(1, 0.5)])
    pages = sorted(c["page_no"] for c in out)
    assert pages == [1, 2]  # the page-1 dup dropped, page-2 kept


def _mini_pdf(body_objs: str, content: str, extra: str = "",
              mediabox: str = "[0 0 612 792]") -> bytes:
    pdf = (
        "%PDF-1.5\n"
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        + body_objs +
        "4 0 obj << /Type /Font /Subtype /Type1 "
        "/BaseFont /Helvetica >> endobj\n"
        f"5 0 obj << /Length {len(content)} >> stream\n"
        f"{content}endstream endobj\n"
        + extra +
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    return pdf.encode("latin-1")


def test_pdf_q_restores_text_state():
    """q/Q saves the text state too (PDF 32000 §8.4.2): a font/size set
    inside q..Q must not leak into the text after Q."""
    from docling_spark.engine.pdfx import PdfDocument, interpret_page

    content = (
        "BT /F1 11 Tf 72 700 Td (before) Tj ET\n"
        "q BT /F1 30 Tf 72 500 Td (inner) Tj ET Q\n"
        "BT 72 300 Td (after) Tj ET\n"
    )
    page_objs = (
        "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n"
    )
    doc = PdfDocument(_mini_pdf(page_objs, content))
    page = doc.pages()[0]
    runs, _ = interpret_page(doc, page, 1)
    sizes = {r.text: r.size for r in runs}
    assert sizes["inner"] == 30.0
    assert sizes["after"] == 11.0  # leaked 30.0 before the fix


def test_pdf_mediabox_origin_normalized():
    """A non-zero MediaBox origin shifts into the base CTM so device
    coordinates live in [0,w]x[0,h]."""
    from docling_spark.engine.pdfx import PdfDocument, interpret_page

    content = "BT /F1 11 Tf 72 850 Td (hello) Tj ET\n"
    page_objs = (
        "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 100 612 892] "
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n"
    )
    doc = PdfDocument(_mini_pdf(page_objs, content))
    runs, (w, h) = interpret_page(doc, doc.pages()[0], 1)
    assert (w, h) == (612.0, 792.0)
    assert abs(runs[0].y - 750.0) < 0.01  # 850 - origin 100


def test_pdf_objstm_overrides_earlier_raw_object():
    """Incremental-update semantics: an object rewritten INTO an ObjStm
    later in the file shadows the stale raw definition."""
    import zlib

    from docling_spark.engine.pdfx import PdfDocument, interpret_page

    new_content = "BT /F1 11 Tf 72 700 Td (new text) Tj ET\n"
    extra = (
        f"6 0 obj << /Length {len(new_content)} >> stream\n"
        f"{new_content}endstream endobj\n"
    )
    # ObjStm redefining page 3 to point at contents 6
    member = ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
              "/Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >>")
    header = f"3 0 "
    body = (header + member).encode("latin-1")
    raw = zlib.compress(body)
    objstm = (
        f"7 0 obj << /Type /ObjStm /N 1 /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(raw)} >> stream\n"
    ).encode("latin-1") + raw + b"\nendstream endobj\n"

    old_content = "BT /F1 11 Tf 72 700 Td (old text) Tj ET\n"
    page_objs = (
        "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n"
    )
    pdf = _mini_pdf(page_objs, old_content,
                    extra=extra).replace(b"trailer",
                                         objstm + b"trailer")
    doc = PdfDocument(pdf)
    runs, _ = interpret_page(doc, doc.pages()[0], 1)
    assert " ".join(r.text for r in runs).strip() == "new text"


def test_dedup_cells_grid_matches_sequential_pass():
    """The spatial-grid candidate index in _dedup_cells_one_page must be
    invisible: byte-identical keep/remove outcome vs the plain ordered
    n² pass it replaced (only provably non-intersecting pairs may be
    skipped — their IoU is 0 both ways)."""
    import random

    from docling_spark.engine.layoutx import dedup_cells

    def seq_dedup(cells):
        def iou(a, b):
            il, it = max(a[0], b[0]), max(a[1], b[1])
            ir, ib = min(a[2], b[2]), min(a[3], b[3])
            if ir <= il or ib <= it:
                return 0.0
            return (ir - il) * (ib - it) / max(
                (a[2] - a[0]) * (a[3] - a[1]), 1e-9)

        out, removed = [], [False] * len(cells)
        for i, a in enumerate(cells):
            if removed[i]:
                continue
            for j in range(i + 1, len(cells)):
                if removed[j]:
                    continue
                b = cells[j]
                if iou(a["bbox"], b["bbox"]) > 0.8 or \
                        iou(b["bbox"], a["bbox"]) > 0.8:
                    aa = (a["bbox"][2] - a["bbox"][0]) * \
                         (a["bbox"][3] - a["bbox"][1])
                    ab = (b["bbox"][2] - b["bbox"][0]) * \
                         (b["bbox"][3] - b["bbox"][1])
                    if (b["conf"], ab) > (a["conf"], aa):
                        removed[i] = True
                        break
                    removed[j] = True
            if not removed[i]:
                out.append(a)
        return out

    rng = random.Random(3)
    for _ in range(60):
        cells = []
        for k in range(rng.randrange(0, 120)):
            x, y = rng.uniform(0, 500), rng.uniform(0, 700)
            w, h = rng.uniform(1, 150), rng.uniform(1, 40)
            cells.append({"page_no": 1, "bbox": (x, y, x + w, y + h),
                          "conf": round(rng.uniform(0.3, 1.0), 2),
                          "label": "text", "text": f"t{k}"})
        got = [c["text"] for c in dedup_cells(list(cells))]
        want = [c["text"] for c in seq_dedup(list(cells))]
        assert got == want


def test_dense_single_page_dedup_is_not_quadratic():
    """20k cells on ONE page must dedup in well under the per-document
    budget (the all-pairs pass took minutes; the grid index is ~linear
    for non-overlapping text grids)."""
    import time

    from docling_spark.engine.layoutx import dedup_cells

    cells = [{"page_no": 1,
              "bbox": ((i % 140) * 4.0, 790.0 - (i // 140) * 5 % 780,
                       (i % 140) * 4.0 + 3, 792.0 - (i // 140) * 5 % 780),
              "conf": 0.9, "label": "text", "text": f"w{i}"}
             for i in range(20000)]
    t0 = time.monotonic()
    out = dedup_cells(cells)
    assert time.monotonic() - t0 < 30.0  # was ~260 s before the grid
    assert len(out) > 1000


def test_macro_heavy_latex_is_linear():
    """Inline-macro handling passes (nodes, start), never a tail copy:
    a \\textbf-per-word document was quadratic in the macro count."""
    import time

    from docling_spark.engine.extract import extract_payload

    p = ("\\documentclass{article}\\begin{document}"
         + "\\textbf{x} " * 30000 + "\\end{document}")
    t0 = time.monotonic()
    r = extract_payload(p, "latex")
    assert time.monotonic() - t0 < 20.0  # was ~6 s at 30k, quadratic
    assert r["status"] == "success"
    assert r["extracted_text"].count("x") == 30000


def test_detect_columns_bisect_matches_scan():
    """The sorted-edge bisect tallies in _detect_columns must equal the
    per-candidate cell scan they replaced, on random mixed layouts."""
    import random

    from docling_spark.engine.layoutx import _detect_columns

    def ref_detect(cells, page_width):
        body = [c for c in cells if c["label"] in ("text", "list_item")]
        if len(body) < 4:
            return None
        lo, hi = 0.25 * page_width, 0.75 * page_width
        candidates = {page_width / 2.0}
        candidates.update(c["bbox"][0] - 1.0 for c in body)
        best = None
        for split in candidates:
            if not lo <= split <= hi:
                continue
            crossers = left = right = 0
            for c in body:
                if c["bbox"][0] < split < c["bbox"][2]:
                    crossers += 1
                elif c["bbox"][2] <= split:
                    left += 1
                else:
                    right += 1
            if crossers <= max(0, int(0.06 * len(body))) \
                    and left >= 2 and right >= 2:
                score = min(left, right)
                if best is None or score > best[0]:
                    best = (score, split)
        return best[1] if best else None

    rng = random.Random(11)
    for trial in range(150):
        n = rng.randrange(0, 60)
        w = rng.choice([400.0, 600.0, 612.0])
        cells = []
        for k in range(n):
            if rng.random() < 0.5:
                x = rng.choice([40.0, w / 2 + 10]) + rng.uniform(-2, 2)
            else:
                x = rng.uniform(0, w - 50)
            y = rng.uniform(0, 700)
            cw = rng.uniform(10, w / 2 - 20)
            cells.append({"page_no": 1, "bbox": (x, y, x + cw, y + 10),
                          "conf": 0.9, "text": "t",
                          "label": rng.choice(
                              ["text", "list_item", "title"])})
        assert _detect_columns(list(cells), w) == ref_detect(list(cells), w)


def test_fixed_token_chunks_null_text_yields_no_chunk(spark):
    from docling_spark.operators.chunker import fixed_token_chunks

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "three real tokens")],
        "doc_id long, text string")
    got = fixed_token_chunks(docs, chunk_tokens=8).collect()
    # null and empty docs produce NOTHING — no phantom ('', n_tokens=1)
    assert [(r["doc_id"], r["n_tokens"]) for r in got] == [(3, 3)]


def test_frame_sample_plan_malformed_duration_degrades(spark):
    from docling_spark.operators.multimodal import frame_sample_plan

    media = spark.createDataFrame(
        [(1, "video", {"duration_s": "n/a"}),
         (2, "video", {"duration_s": "4.0"})],
        "media_id long, kind string, meta map<string,string>")
    got = (frame_sample_plan(media, fps=0.5).groupBy("media_id").count()
           .collect())
    counts = {r["media_id"]: r["count"] for r in got}
    # 'n/a' falls back to the 10s default (5 frames at 0.5 fps), not an
    # ANSI cast error killing the job
    assert counts == {1: 5, 2: 2}


def test_salt_skew_spreads_uniformly(spark):
    from docling_spark.jobs.extract_job import salt_skew

    df = spark.range(0, 2000).select(
        F.lit("conv0").alias("conv_id"), F.col("id").alias("turn_idx"))
    parts = salt_skew(df, 32).rdd.glom().map(len).collect()
    nonempty = sum(1 for p in parts if p)
    # hashing the full key space: every partition used, no 4x stragglers
    assert nonempty == 32
    assert max(parts) < 2 * (2000 / 32)


def test_dedup_stream_null_text_filtered(spark):
    from docling_spark.streaming.stateful import dedup_stream
    # batch-planning check only (stream execution covered elsewhere):
    # the plan filters null fingerprints so no null-key state group can
    # emit text='None'
    from docling_spark.operators.textstats import fingerprint

    docs = spark.createDataFrame(
        [(1, None), (2, "real")], "doc_id long, text string")
    pre = docs.select(fingerprint(F.col("text")).alias("fingerprint"),
                      "doc_id", "text") \
        .filter(F.col("fingerprint").isNotNull())
    assert [r["doc_id"] for r in pre.collect()] == [2]
