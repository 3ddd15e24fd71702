"""METS-GBS (Google Books) payload → item table.

Re-expression of the reference METS backend
(docling/backend/mets_gbs_backend.py): a ``.tar.gz`` archive holding a
``<mets:mets PROFILE="gbs">`` manifest plus per-page hOCR files.  The
manifest's fileGrp USE types (image / OCR / coordOCR) map file IDs to
members; ``<mets:div TYPE="page" ORDER="n">`` assigns page order
(mets_gbs_backend.py:266-318).  Each page's coordOCR hOCR is parsed for
``ocr_line`` spans — bbox + x_wconf from the title attribute
(:382-429, _extract_rect/_extract_confidence) — and the resulting text
cells run through the same rule-based layout pipeline as the pdfish
path (engine/layoutx.py: confidence filter, dedup, column-aware reading
order, block merge).  Page images (.tif) are never decoded — no image
libraries in this environment; text extraction needs only the hOCR.

Decompression-bomb limits mirror MetsGbsBackendOptions
(datamodel/backend_options.py:219-233): 10 MB per member, 300 MB total,
1000 members.
"""

from __future__ import annotations

import io
import tarfile
import xml.etree.ElementTree as ET
from html.parser import HTMLParser

from docling_spark.engine.layoutx import extract_from_cells

METS = "{http://www.loc.gov/METS/}"
XLINK = "{http://www.w3.org/1999/xlink}"

MAX_FILE_BYTES = 10 * 1024 * 1024
MAX_TOTAL_BYTES = 300 * 1024 * 1024
MAX_MEMBER_COUNT = 1000


class MetsError(ValueError):
    pass


def _title_bbox(title: str) -> tuple[float, float, float, float] | None:
    for part in title.split(";"):
        part = part.strip()
        if part.startswith("bbox "):
            try:
                l, t, r, b = (float(v) for v in part.split()[1:5])
                return (l, t, r, b)
            except (ValueError, IndexError):
                return None
    return None


def _title_conf(title: str) -> float:
    for part in title.split(";"):
        part = part.strip()
        if part.startswith("x_wconf"):
            try:
                return float(part.split()[1]) / 100.0
            except (ValueError, IndexError):
                return 1.0
    return 1.0


class _HocrLines(HTMLParser):
    """Collect (bbox, conf, text) for every ``ocr_line`` span."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.lines: list[tuple[tuple, float, str]] = []
        self._stack: list[tuple[str, str] | None] = []  # (bbox?, title)
        self._buf: list[list[str]] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "span" and a.get("class") == "ocr_line":
            self._stack.append(("line", a.get("title", "")))
            self._buf.append([])
        elif self._buf:
            self._stack.append(None)

    def handle_endtag(self, tag):
        if not self._stack:
            return
        top = self._stack.pop()
        if top is not None and top[0] == "line":
            text = " ".join("".join(self._buf.pop()).split())
            title = top[1]
            bbox = _title_bbox(title)
            if bbox and text:
                self.lines.append((bbox, _title_conf(title), text))

    def handle_data(self, data):
        if self._buf:
            self._buf[-1].append(data)


def extract_mets_gbs(payload: bytes) -> tuple[str, list[dict], dict]:
    """payload (.tar.gz bytes) → (extracted_text, items, metrics)."""
    try:
        tar = tarfile.open(fileobj=io.BytesIO(payload), mode="r:gz")
    except tarfile.TarError as exc:
        raise MetsError(f"not a tar.gz archive: {exc}") from exc

    members = {}
    total = 0
    root = None
    with tar:
        for i, member in enumerate(tar.getmembers()):
            if i >= MAX_MEMBER_COUNT:
                raise MetsError(
                    f"archive exceeds member count limit {MAX_MEMBER_COUNT}")
            if not member.isfile():
                continue
            members[member.name.lstrip("./")] = member
        # locate the METS manifest
        for name, member in members.items():
            if not name.endswith(".xml"):
                continue
            data = _read_limited(tar, member)
            total += len(data)
            if total > MAX_TOTAL_BYTES:
                raise MetsError("archive exceeds total extraction limit")
            try:
                cand = ET.fromstring(data)
            except ET.ParseError:
                continue
            if cand.tag == METS + "mets" and cand.get("PROFILE") == "gbs":
                root = cand
                break
        if root is None:
            raise MetsError("no <mets:mets PROFILE='gbs'> manifest found")

        # file ID → (use, path)
        file_by_id: dict[str, tuple[str, str]] = {}
        for grp in root.iter(METS + "fileGrp"):
            use = grp.get("USE", "")
            if use not in ("image", "OCR", "coordOCR"):
                continue
            for f in grp.findall(METS + "file"):
                loc = f.find(METS + "FLocat")
                href = loc.get(XLINK + "href") if loc is not None else None
                if f.get("ID") and href:
                    file_by_id[f.get("ID")] = (use, href.lstrip("./"))

        # page order → coordOCR member
        pages: list[tuple[int, str]] = []
        for div in root.iter(METS + "div"):
            if div.get("TYPE") != "page" or not div.get("ORDER"):
                continue
            try:
                order = int(div.get("ORDER"))
            except ValueError:
                continue
            for fptr in div.findall(METS + "fptr"):
                got = file_by_id.get(fptr.get("FILEID", ""))
                if got and got[0] == "coordOCR":
                    pages.append((order, got[1]))
        pages.sort()
        if not pages:
            raise MetsError("manifest maps no coordOCR pages")

        cells: list[dict] = []
        for order, path in pages:
            member = members.get(path)
            if member is None:
                continue
            data = _read_limited(tar, member)
            total += len(data)
            if total > MAX_TOTAL_BYTES:
                raise MetsError("archive exceeds total extraction limit")
            hp = _HocrLines()
            hp.feed(data.decode("utf-8", errors="replace"))
            for bbox, conf, text in hp.lines:
                cells.append({
                    "page_no": order,
                    "bbox": bbox,
                    "text": text,
                    "conf": conf,
                    "label": "text",
                })

    text, items, metrics = extract_from_cells(cells)
    metrics["pages_parsed"] = len(pages)
    return text, items, metrics


def _read_limited(tar: tarfile.TarFile, member: tarfile.TarInfo) -> bytes:
    f = tar.extractfile(member)
    if f is None:
        return b""
    data = f.read(MAX_FILE_BYTES + 1)
    if len(data) > MAX_FILE_BYTES:
        raise MetsError(
            f"member {member.name} exceeds size limit {MAX_FILE_BYTES}")
    return data
