"""Per-turn extraction: format routing + error containment.

The single-document entry point of the engine, mirroring the reference
conversion lifecycle (docling/document_converter.py:441-503 →
pipeline/base_pipeline.py:65-98) with its invariants:

- format detection by hint then content sniffing
  (docling/datamodel/document.py:763-1100)
- size limits → SKIPPED status (docling/datamodel/settings.py:23-26,
  document.py:290-298)
- failures NEVER propagate: malformed payloads produce a FAILURE result row
  with structured errors (base_pipeline.py:84-94 raises_on_error=False path,
  ErrorItem/FailureCategory base_models.py:287-327)
- every input turn yields exactly one result (missing-page placeholder rule,
  standard_pdf_pipeline.py:1139-1175)

Pure Python; the Spark operator wraps :func:`extract_payload` in a
mapInPandas batch loop.
"""

from __future__ import annotations

import re

from docling_spark.engine import asciidocx, csvx, emailx, htmlx, layoutx, mdx, vttx
from docling_spark.functions.textnorm import normalize_plain, rate_text_quality

STATUS_SUCCESS = "success"
STATUS_PARTIAL = "partial_success"
STATUS_FAILURE = "failure"
STATUS_SKIPPED = "skipped"

# DocumentLimits.max_file_size analog (settings.py:23-26); payloads above
# this are skipped, not parsed.
DEFAULT_MAX_BYTES = 8 * 1024 * 1024

KNOWN_FORMATS = ("html", "md", "csv", "pdfish", "pdf", "code", "vtt",
                 "email", "asciidoc", "epub", "docling_json", "docx",
                 "deepseek", "xlsx", "pptx", "ebcdic", "boxnote", "jats",
                 "odt", "ods", "odp", "uspto", "latex", "doclang",
                 "mets_gbs", "chandra", "dots", "xbrl", "image", "glm_json",
                 "doctags", "docling_yaml", "media", "docbin", "xlsbin",
                 "pptbin", "legacy_office", "plain")

# hint-alias spellings accepted wherever a format name is taken (the
# tool column AND the allowed-formats policy list)
_HINT_ALIASES = {"dclx": "doclang", "mets": "mets_gbs", "glm": "glm_json",
                 "yaml": "docling_yaml", "adoc": "asciidoc",
                 "doc": "docbin", "dot": "docbin", "xls": "xlsbin",
                 "xlt": "xlsbin", "ppt": "pptbin", "pot": "pptbin",
                 **{a: "image" for a in ("png", "jpg", "jpeg", "gif",
                                         "bmp", "webp", "tiff", "tif",
                                         "ico")},
                 **{a: "media" for a in ("audio", "video", "wav", "mp3",
                                         "flac", "ogg", "m4a", "mp4",
                                         "mov", "avi", "aac", "asr")}}

_ADOC_SNIFF_RE = re.compile(r"(?m)^= \S.*\n(?:.*\n)*?^==+ \S")

_HTML_SNIFF_RE = re.compile(r"(?is)^\s*(<!doctype\s+html|<html[\s>]|<body[\s>])")
_HTML_TAGS_RE = re.compile(r"(?s)<[a-zA-Z][^>]*>.*</[a-zA-Z]")
# bounded probe: an unbounded '.*' scan paid a full-document pass per
# sniff and classified ANY JSON containing "bbox" at any depth as
# pdfish. The key may sit on a later line (a pdfish payload can open
# with the page-size declaration line), so the sniff is {-prefix plus a
# windowed key search, like the sibling sniffs.
_BBOX_KEY_RE = re.compile(r'"bbox"\s*:')
_DOCLING_JSON_KEY_RE = re.compile(r'"schema_name"\s*:\s*"DoclingDocument"')
_MD_CUES_RE = re.compile(r"(?m)^(#{1,6}\s|\s*[-*+]\s+\S|\s*\d+\.\s+\S|```)")
_YAML_HEAD_RE = re.compile(r"\s*[a-z_]+:\s")


def detect_format(text: str, tool: str = "", _carry: dict | None = None
                  ) -> str:
    """Extension/MIME routing analog (base_models.py:143-263): the ``tool``
    column is the format hint; content sniffing is the fallback
    (document.py:1014 HTML detection, 1058 CSV dialect detection).

    ``_carry`` (internal): extract_payload passes a dict so the OLE sniff
    can hand over its decoded bytes — classifying .doc/.xls/.ppt needs
    the container directory, and decoding a multi-MB base64 payload
    twice (sniff + handler) doubled the costliest part of routing."""
    hint = (tool or "").strip().lower()
    if hint == "adoc":
        hint = "asciidoc"
    if hint in ("image", "png", "jpg", "jpeg", "gif", "bmp", "webp",
                "tiff", "tif", "ico"):
        return "image"
    if hint in ("audio", "video", "wav", "mp3", "flac", "ogg", "m4a",
                "mp4", "mov", "avi", "aac", "asr"):
        return "media"
    if hint in ("doc", "dot"):
        # legacy Word binary: parsed NATIVELY (engine/docbinx.py) — the
        # reference needs a LibreOffice subprocess for this format
        return "docbin"
    if hint in ("xls", "xlt"):
        # legacy Excel binary: parsed NATIVELY (engine/xlsbinx.py) — the
        # reference needs a LibreOffice subprocess for this format
        return "xlsbin"
    if hint in ("ppt", "pot"):
        # legacy PowerPoint binary: parsed NATIVELY (engine/pptbinx.py) —
        # the reference needs a LibreOffice subprocess for this format
        return "pptbin"
    if hint in ("html", "md", "csv", "pdfish", "pdf", "code", "vtt", "email",
                "asciidoc", "epub", "docling_json", "docx", "deepseek",
                "xlsx", "pptx", "ebcdic", "boxnote", "jats",
                "odt", "ods", "odp", "uspto", "latex", "doclang", "dclx",
                "mets_gbs", "mets", "chandra", "dots", "xbrl",
                "glm", "glm_json", "doctags", "yaml", "docling_yaml"):
        return _HINT_ALIASES.get(hint, hint)
    ls = text.lstrip() if text else ""  # shared: the sniffs below probe
    # the first non-ws char repeatedly; one lstrip instead of four
    if text and text.find("<|ref|>", 0, 8192) >= 0:
        from docling_spark.engine import deepseekx

        if deepseekx.looks_like_deepseek(text):
            return "deepseek"
    if ls.startswith("{") and \
            _DOCLING_JSON_KEY_RE.search(text, 0, 2048):
        # regex, not an exact-substring find: compact serialization
        # (separators=(',',':')) drops the ': ' spacing and previously
        # fell through to the pdfish sniff via prov "bbox" keys
        return "docling_json"
    if ls.startswith("{") and \
            (text.find('"file-info"', 0, 4096) >= 0
             or text.find('"page-elements"', 0, 4096) >= 0) \
            and '"page-elements"' in text:
        # legacy GLM layout-model JSON (utils/glm_utils.py input shape).
        # Key order varies and the payload arrays are unbounded, so one
        # key anchors in the head window and the other may sit anywhere
        # (the full scan only runs for {-prefixed payloads that already
        # matched a GLM key up front)
        return "glm_json"
    if text and not ls.startswith(("{", "<")) and \
            _YAML_HEAD_RE.match(text) and \
            "schema_name: DoclingDocument" in text:
        # the CLI's save_as_yaml artifact (same model as the JSON
        # export). safe_dump sorts keys, so schema_name lands AFTER the
        # unbounded body/groups/texts sections — the full scan is gated
        # on the cheap yaml-mapping head shape
        return "docling_yaml"
    if ls.startswith("<doclang"):
        return "doclang"
    if ls.startswith("<doctag>"):
        # SmolDocling-style VLM DocTags answer (vlm_pipeline.py:447-465)
        return "doctags"
    if text and text.find("http://www.xbrl.org/2003/instance", 0, 4096) >= 0 \
            and text.find("<", 0, 64) >= 0:
        return "xbrl"
    if ls.startswith("[") and text.find('"category"', 0, 4096) >= 0 \
            and text.find('"bbox"', 0, 4096) >= 0:
        return "dots"
    if text and text.find("data-bbox=", 0, 4096) >= 0 \
            and text.find("data-label=", 0, 4096) >= 0:
        from docling_spark.engine import chandrax

        if chandrax.looks_like_chandra(text):
            return "chandra"
    if not text or text.isspace():
        return "plain"
    # base64-encoded image magic (binary payloads travel b64 in the text
    # column): PNG / JPEG / GIF / RIFF-WEBP / TIFF prefixes
    if text.startswith(("iVBORw0KGgo", "/9j/", "R0lGOD",
                        "SUkqAA", "TU0AKg")):
        return "image"
    if text.startswith("UklGR"):
        # base64 RIFF: WEBP is an image; WAVE/AVI are media — decode the
        # 12-byte header to disambiguate
        import base64

        try:
            head = base64.b64decode(text[:16] + "=" * 2)[:12]
        except Exception:
            head = b""
        return "media" if head[8:12] in (b"WAVE", b"AVI ") else "image"
    if text.startswith(("ZkxhQw", "T2dnUw", "SUQz")):  # fLaC / OggS / ID3
        return "media"
    # native PDF: raw %PDF- header (latin-1-safe) or its base64 prefix
    if text.startswith(("%PDF-", "JVBERi")):
        return "pdf"
    if text.startswith("0M8R4KGx"):  # base64 OLE2 magic d0cf11e0a1b1
        # .doc vs .xls/.ppt needs the directory: peek the stream names
        import base64

        from docling_spark.engine import olex

        try:
            raw = base64.b64decode(text)
            if _carry is not None:
                _carry["ole_raw"] = raw
            streams = olex.OleFile(raw).streams()
        except Exception:
            streams = []
        if "WordDocument" in streams:
            return "docbin"
        if "Workbook" in streams or "Book" in streams:
            return "xlsbin"
        if "PowerPoint Document" in streams:
            return "pptbin"
        # other OLE2 containers (Visio, MSI, Publisher, …): the
        # reference has no backend either — contained failure row
        return "legacy_office"
    if text.lstrip("﻿").lstrip().startswith("WEBVTT"):
        return "vtt"
    if emailx.looks_like_email(text):
        return "email"
    if ls.startswith("{") and _BBOX_KEY_RE.search(text, 0, 4096):
        return "pdfish"
    if _HTML_SNIFF_RE.match(text) or _HTML_TAGS_RE.search(text, 0, 4096):
        return "html"
    if text.startswith("= ") and _ADOC_SNIFF_RE.match(text, 0, 4096):
        return "asciidoc"
    if _MD_CUES_RE.search(text, 0, 4096):
        return "md"
    # CSV head probe bounded to the 5th newline: a multi-MB malformed
    # blob must not pay a full splitlines just to be called plain, and no
    # probed line is ever truncated (the first 5 splitlines-lines always
    # end at or before the 5th \n, since every \n is a splitlines
    # terminator)
    end = 0
    for _ in range(5):
        nl = text.find("\n", end)
        if nl < 0:
            end = len(text)
            break
        end = nl + 1
    head = [ln for ln in text[:end].splitlines()[:5] if ln.strip()]
    if len(head) >= 2:
        for d in (",", ";", "\t", "|"):
            counts = [ln.count(d) for ln in head]
            if min(counts) >= 1 and len(set(counts)) == 1:
                return "csv"
    return "plain"


# serializer-facing extras carried as ONE sparse stringified map (see
# schema.ITEM_SCHEMA: ten mostly-null struct fields measurably halved
# extraction throughput); operators/export.clean_item restores types
_ITEM_BASE_KEYS = ("item_idx", "parent_idx", "label", "level", "text",
                   "content_layer", "span_start", "span_end",
                   "code_language")
_ITEM_EXTRA_KEYS = ("page_no", "_hlevel", "_marker", "_start", "_inline",
                    "_raw", "_cap_ref", "_table_caption", "num_rows",
                    "num_cols")


_ITEM_EXTRA_SET = frozenset(_ITEM_EXTRA_KEYS)


def _project_item(it: dict) -> dict:
    g = it.get
    out = {
        "item_idx": g("item_idx"), "parent_idx": g("parent_idx"),
        "label": g("label"), "level": g("level"), "text": g("text"),
        "content_layer": g("content_layer"), "span_start": g("span_start"),
        "span_end": g("span_end"), "code_language": g("code_language"),
        "extras": None,
    }
    if _ITEM_EXTRA_SET.intersection(it):  # rare: most items carry no extras
        extras = None
        for k in _ITEM_EXTRA_KEYS:  # fixed key order keeps hashes stable
            v = g(k)
            if v is not None:
                if extras is None:
                    extras = {}
                extras[k] = str(v)
        out["extras"] = extras
    return out


_EMPTY_METRICS = {
    "pages_parsed": 0,
    "parse_score": 0.0,
    "boilerplate_ratio": 0.0,
    "n_items": 0,
}


def _plain_result(text: str) -> tuple[str, list[dict], dict]:
    norm = normalize_plain(text)
    items = [
        dict(item_idx=0, parent_idx=-1, label="unspecified", level=0,
             text="_root_", content_layer="body", span_start=-1, span_end=-1),
    ]
    if norm:
        items.append(
            dict(item_idx=1, parent_idx=0, label="text", level=1, text=norm,
                 content_layer="body", span_start=0, span_end=len(norm))
        )
    metrics = {
        "pages_parsed": 1,
        "parse_score": rate_text_quality(norm),
        "boilerplate_ratio": 0.0,
        "n_items": len(items) - 1,
    }
    return norm, items, metrics


def _code_result(text: str) -> tuple[str, list[dict], dict]:
    """Tool-output blobs pass through newline-preserving as code items
    (html_backend.py:2740-2771 pre semantics)."""
    body = text.strip("\n").rstrip()
    rendered = "```\n" + body + "\n```"
    items = [
        dict(item_idx=0, parent_idx=-1, label="unspecified", level=0,
             text="_root_", content_layer="body", span_start=-1, span_end=-1),
        # span delimits the item TEXT inside extracted_text (the same
        # exactness _plain_result keeps): fences are rendering, not item
        dict(item_idx=1, parent_idx=0, label="code", level=1, text=body,
             content_layer="body", span_start=4, span_end=4 + len(body)),
    ]
    lang = htmlx.detect_code_language(body)
    items[1]["code_language"] = lang
    metrics = {
        "pages_parsed": 1,
        "parse_score": rate_text_quality(body),
        "boilerplate_ratio": 0.0,
        "n_items": 1,
    }
    return rendered, items, metrics


def _html_result(text: str) -> tuple[str, list[dict], dict]:
    extracted, items = htmlx.extract_html(text)
    n_body = sum(1 for it in items[1:] if it["content_layer"] == "body")
    n_all = max(len(items) - 1, 1)
    metrics = {
        "pages_parsed": 1,
        "parse_score": 1.0,
        "boilerplate_ratio": 1.0 - n_body / n_all,
        "n_items": len(items) - 1,
    }
    return extracted, items, metrics


def extract_payload(
    text: str | None,
    tool: str = "",
    max_bytes: int = DEFAULT_MAX_BYTES,
    pdf_passwords: tuple[str, ...] = (),
    allowed_formats: frozenset[str] | set[str] | tuple[str, ...] | None = None,
) -> dict:
    """One turn in → one result dict out; never raises.

    Returns ``{status, format, extracted_text, items, errors, metrics}``.
    """
    errors: list[dict] = []
    if text is None:
        return {
            "status": STATUS_FAILURE,
            "format": "plain",
            "extracted_text": "",
            "items": [],
            "errors": [{"module": "input", "message": "null payload",
                        "category": "input_error"}],
            "metrics": dict(_EMPTY_METRICS),
        }
    # byte-size gate without the up-to-8MB encode on the hot path:
    # len(text) > max_bytes ⇒ over (≥1 byte/char); len*4 ≤ max_bytes ⇒
    # under (≤4 bytes/char); only the narrow band between needs the
    # real encode
    if len(text) > max_bytes or (
        len(text) * 4 > max_bytes
        and len(text.encode("utf-8", errors="replace")) > max_bytes
    ):
        return {
            "status": STATUS_SKIPPED,
            "format": "plain",
            "extracted_text": "",
            "items": [],
            "errors": [{"module": "limits",
                        "message": f"payload exceeds {max_bytes} bytes",
                        "category": "size_limit"}],
            "metrics": dict(_EMPTY_METRICS),
        }
    _carry: dict = {}
    fmt = detect_format(text, tool, _carry)
    if allowed_formats is not None:
        # accept the same alias spellings the hint vocabulary accepts
        # (--from adoc must allow what tool='adoc' detects as)
        allowed_formats = frozenset(
            _HINT_ALIASES.get(a, a) for a in allowed_formats)
    if allowed_formats is not None and fmt not in allowed_formats:
        # allowed-format policy (document_converter.py:738-752): a
        # disallowed format is SKIPPED with a POLICY-category error —
        # never attempted, never a failure. The gate sits after format
        # detection and before any engine runs, mirroring the reference's
        # pre-pipeline check in _process_document.
        return {
            "status": STATUS_SKIPPED,
            "format": fmt,
            "extracted_text": "",
            "items": [],
            "errors": [{"module": "user_input",
                        "message": f"File format not allowed: {fmt}",
                        "category": "policy"}],
            "metrics": dict(_EMPTY_METRICS),
        }
    if fmt == "media":
        # the reference's ASR path needs ffmpeg + whisper
        # (asr_transcriber.py MISSING_FFMPEG_MESSAGE); absent runtimes are
        # a contained failure row — but the stream PROBE is real
        # (engine/audiox.py), so the error carries the technical metadata
        # a scheduler can route on
        import base64

        from docling_spark.engine.audiox import probe_media

        try:
            blob = base64.b64decode(text, validate=False) \
                if not text.startswith(("RIFF", "fLaC", "OggS", "ID3")) \
                else text.encode("latin-1", "ignore")
        except Exception:
            blob = b""
        m = probe_media(blob)
        probe = ", ".join(
            f"{k}={m[k]}" for k in
            ("container", "codec", "duration_s", "sample_rate", "channels")
            if m.get(k) is not None
        )
        return {
            "status": STATUS_FAILURE,
            "format": "media",
            "extracted_text": "",
            "items": [],
            "errors": [{"module": "asr",
                        "message": "ASR transcription requires an "
                                   "ffmpeg+whisper runtime (reference "
                                   "delegates; not available here); "
                                   f"stream probe: {probe or 'unrecognized'}",
                        "category": "dependency_error"}],
            "metrics": dict(_EMPTY_METRICS),
        }
    if fmt == "legacy_office":
        return {
            "status": STATUS_FAILURE,
            "format": "legacy_office",
            "extracted_text": "",
            "items": [],
            "errors": [{"module": "routing",
                        "message": "legacy Office format requires a "
                                   "LibreOffice conversion step (reference "
                                   "delegates; not available here)",
                        "category": "dependency_error"}],
            "metrics": dict(_EMPTY_METRICS),
        }
    try:
        if fmt == "html":
            extracted, items, metrics = _html_result(text)
        elif fmt == "md":
            extracted, items, metrics = mdx.extract_markdown(text)
        elif fmt == "csv":
            extracted, items, metrics = csvx.extract_csv(text)
        elif fmt == "pdfish":
            extracted, items, metrics = layoutx.extract_layout(text)
        elif fmt == "vtt":
            extracted, items, metrics = vttx.extract_vtt(text)
        elif fmt == "email":
            extracted, items, metrics = emailx.extract_email(text)
        elif fmt == "asciidoc":
            extracted, items, metrics = asciidocx.extract_asciidoc(text)
        elif fmt == "deepseek":
            from docling_spark.engine import deepseekx

            extracted, items, metrics = deepseekx.extract_deepseek(text)
        elif fmt == "docling_json":
            from docling_spark.engine import jsonx

            extracted, items, metrics = jsonx.extract_docling_json(text)
        elif fmt == "glm_json":
            from docling_spark.engine import glmx

            extracted, items, metrics = glmx.extract_glm(text)
        elif fmt == "doctags":
            from docling_spark.engine import doctagsx

            extracted, items, metrics = doctagsx.extract_doctags(text)
        elif fmt == "docling_yaml":
            from docling_spark.engine import jsonx

            extracted, items, metrics = jsonx.extract_docling_yaml(text)
        elif fmt == "epub":
            # binary formats travel base64-encoded in the text column
            import base64

            from docling_spark.engine import epubx

            extracted, items, metrics = epubx.extract_epub(
                base64.b64decode(text)
            )
        elif fmt == "docx":
            import base64

            from docling_spark.engine import docxx

            extracted, items, metrics = docxx.extract_docx(
                base64.b64decode(text)
            )
        elif fmt == "xlsx":
            import base64

            from docling_spark.engine import xlsxx

            extracted, items, metrics = xlsxx.extract_xlsx(
                base64.b64decode(text)
            )
        elif fmt == "pptx":
            import base64

            from docling_spark.engine import pptxx

            extracted, items, metrics = pptxx.extract_pptx(
                base64.b64decode(text)
            )
        elif fmt == "docbin":
            import base64

            from docling_spark.engine import docbinx

            raw_d = _carry.get("ole_raw") or (
                text.encode("latin-1", "ignore")
                if text.startswith("\xd0\xcf")
                else base64.b64decode(text))
            extracted, items, metrics = docbinx.extract_doc(raw_d)
        elif fmt == "xlsbin":
            import base64

            from docling_spark.engine import xlsbinx

            raw_x = _carry.get("ole_raw") or (
                text.encode("latin-1", "ignore")
                if text.startswith("\xd0\xcf")
                else base64.b64decode(text))
            extracted, items, metrics = xlsbinx.extract_xls(raw_x)
        elif fmt == "pptbin":
            import base64

            from docling_spark.engine import pptbinx

            raw_pp = _carry.get("ole_raw") or (
                text.encode("latin-1", "ignore")
                if text.startswith("\xd0\xcf")
                else base64.b64decode(text))
            extracted, items, metrics = pptbinx.extract_ppt(raw_pp)
        elif fmt == "pdf":
            from docling_spark.engine import pdfx

            if text.startswith("%PDF-"):
                raw_p = text.encode("latin-1", "ignore")
            else:
                import base64

                raw_p = base64.b64decode(text)
            # job-level password list (the reference's per-document
            # backend_options password, datamodel/backend_options.py);
            # the engine always tries the empty user password itself
            pw_list = ("",) + tuple(pdf_passwords)
            for pw_i, pw in enumerate(pw_list):
                try:
                    extracted, items, metrics = pdfx.extract_pdf(
                        raw_p, password=pw)
                    break
                except pdfx.PdfError as exc:
                    # exhaust by POSITION, not value: a duplicate or an
                    # early password equal to the last entry must not
                    # abort the retries before every password is tried
                    if "password" not in str(exc) or pw_i == len(pw_list) - 1:
                        raise
        elif fmt == "ebcdic":
            from docling_spark.engine import ebcdicx

            extracted, items, metrics = ebcdicx.extract_ebcdic(text)
        elif fmt == "boxnote":
            from docling_spark.engine import boxnotex

            extracted, items, metrics = boxnotex.extract_boxnote(text)
        elif fmt == "jats":
            from docling_spark.engine import jatsx

            extracted, items, metrics = jatsx.extract_jats(text)
        elif fmt == "uspto":
            from docling_spark.engine import usptox

            extracted, items, metrics = usptox.extract_uspto(text)
        elif fmt == "latex":
            from docling_spark.engine import latexx

            if "\\begin{document}" not in text and \
                    text.lstrip().startswith("UEsDB"):
                # base64 zip of an arXiv-style multi-file tex tree
                import base64

                extracted, items, metrics = latexx.extract_latex_archive(
                    base64.b64decode(text)
                )
            else:
                extracted, items, metrics = latexx.extract_latex(text)
        elif fmt == "xbrl":
            from docling_spark.engine import xbrlx

            raw_x: bytes | str = text
            if not text.lstrip().startswith("<"):
                import base64

                raw_x = base64.b64decode(text)  # instance+taxonomy zip
            extracted, items, metrics = xbrlx.extract_xbrl(raw_x)
        elif fmt == "dots":
            from docling_spark.engine import dotsx

            extracted, items, metrics = dotsx.extract_dots(text)
        elif fmt == "chandra":
            from docling_spark.engine import chandrax

            extracted, items, metrics = chandrax.extract_chandra(text)
        elif fmt == "mets_gbs":
            import base64

            from docling_spark.engine import metsx

            extracted, items, metrics = metsx.extract_mets_gbs(
                base64.b64decode(text)
            )
        elif fmt == "doclang":
            from docling_spark.engine import doclangx

            raw: bytes | str = text
            if not text.lstrip().startswith("<"):
                import base64

                raw = base64.b64decode(text)  # .dclx archive travels b64
            extracted, items, metrics = doclangx.extract_doclang(raw)
        elif fmt in ("odt", "ods", "odp"):
            import base64

            from docling_spark.engine import odfx

            extracted, items, metrics = odfx.extract_odf(
                base64.b64decode(text), fmt
            )
        elif fmt == "image":
            import base64

            from docling_spark.engine import imagex

            extracted, items, metrics = imagex.extract_image(
                base64.b64decode(text)
            )
        elif fmt == "code":
            extracted, items, metrics = _code_result(text)
        else:
            extracted, items, metrics = _plain_result(text)
    except Exception as exc:  # containment: ErrorItem row, not a task error
        return {
            "status": STATUS_FAILURE,
            "format": fmt,
            "extracted_text": "",
            "items": [],
            "errors": [{"module": f"engine.{fmt}", "message": str(exc)[:500],
                        "category": "parse_error"}],
            "metrics": dict(_EMPTY_METRICS),
        }
    status = STATUS_SUCCESS
    if metrics.get("parse_score", 1.0) == 0.0 and extracted:
        status = STATUS_PARTIAL
        errors.append({"module": f"engine.{fmt}",
                       "message": "low parse quality", "category": "quality"})
    return {
        "status": status,
        "format": fmt,
        "extracted_text": extracted,
        "items": [_project_item(it) for it in items],
        "errors": errors,
        "metrics": metrics,
    }
