"""Native PDF payloads → text-line cells → the shared layout pipeline.

A from-scratch, pure-Python (stdlib-only: zlib, base64, re) PDF text
extractor, written against the public PDF 32000-1:2008 spec. It replaces
the native-library half of the reference's PDF path — docling-parse /
pypdfium2 produce per-line ``TextCell``s with bounding boxes
(docling/backend/docling_parse_v4_backend.py, pypdfium2_backend.py) —
and feeds the SAME downstream layout pipeline this repo already ships
(``layoutx.extract_from_cells``: cell filters → overlap dedup →
two-column reading order → table assembly → paragraph merge), exactly
how the reference splits parsing (native lib) from layout
(layout_postprocessor.py).

What is real here: object/xref-free document scan (every ``N G obj``
plus /Type/ObjStm expansion, so PDF 1.5+ compressed-object files work),
Flate/LZW/ASCIIHex/ASCII85 filters with PNG predictors, page-tree walk
with attribute inheritance, content-stream interpretation (full text
matrix state machine: BT/ET Tm Td TD T* TL Tf Tc Tw Tz Ts Tj TJ ' " q/Q
cm), simple-font and Type0/CID decode via /ToUnicode CMaps, /Differences
+ WinAnsi fallbacks, and /Widths-driven advance arithmetic for line/word
segmentation. What is not attempted: OCR of scanned pages, embedded-font
glyph-program inspection, and the reference's ML layout model (labels
come from this repo's rule-based layoutx, a documented re-expression).

No code from the reference is used; the reference is consulted only for
*what* to emit (per-line cells with top-left-origin bboxes, page sizes).
"""

from __future__ import annotations

import base64
import re
import zlib

__all__ = ["PdfError", "PdfDocument", "extract_pdf", "pdf_line_cells"]


class PdfError(ValueError):
    pass


# ---------------------------------------------------------------------------
# object model
# ---------------------------------------------------------------------------

class Name(str):
    """A /Name token (distinct from a string literal)."""
    __slots__ = ()


class Ref(tuple):
    """Indirect reference (num, gen)."""
    __slots__ = ()

    def __new__(cls, num: int, gen: int):
        return super().__new__(cls, (num, gen))


class Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _skip_ws(b: bytes, i: int) -> int:
    n = len(b)
    while i < n:
        c = b[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment
            while i < n and b[i] not in b"\r\n":
                i += 1
        else:
            break
    return i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_TAIL_RE = re.compile(rb"(\d+)\s+R\b")
_NAME_ESC = re.compile(rb"#([0-9A-Fa-f]{2})")


_WS_DELIM = _WS + _DELIM


def _parse_name(b: bytes, i: int):
    j = i + 1
    n = len(b)
    while j < n and b[j] not in _WS_DELIM:
        j += 1
    raw = b[i + 1:j]
    if b"#" in raw:  # PDF name escape (#xx) — rare; skip the regex otherwise
        raw = _NAME_ESC.sub(lambda m: bytes([int(m.group(1), 16)]), raw)
    return Name(raw.decode("latin-1")), j


def _parse_string(b: bytes, i: int):
    # literal (..) with nesting + backslash escapes
    out = bytearray()
    depth = 1
    i += 1
    n = len(b)
    while i < n and depth:
        c = b[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nc = b[i + 1]
            esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                   0x28: 40, 0x29: 41, 0x5C: 92}
            if nc in esc:
                out.append(esc[nc])
                i += 2
            elif 0x30 <= nc <= 0x37:  # octal, up to 3 digits
                j = i + 1
                oct_s = b""
                while j < n and len(oct_s) < 3 and 0x30 <= b[j] <= 0x37:
                    oct_s += bytes([b[j]])
                    j += 1
                out.append(int(oct_s, 8) & 0xFF)
                i = j
            elif nc in b"\r\n":  # line continuation
                i += 2
                if nc == 0x0D and i < n and b[i] == 0x0A:
                    i += 1
            else:
                out.append(nc)
                i += 2
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex_string(b: bytes, i: int):
    j = b.find(b">", i)
    if j < 0:
        j = len(b)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", b[i + 1:j])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode()), j + 1


def parse_object(b: bytes, i: int):
    """Recursive-descent parse of one PDF object starting at i.

    Returns (obj, next_index). Indirect refs come back as Ref."""
    i = _skip_ws(b, i)
    if i >= len(b):
        raise PdfError("eof")
    c = b[i]
    if c == 0x2F:  # /
        return _parse_name(b, i)
    if c == 0x28:  # (
        return _parse_string(b, i)
    if c == 0x3C:  # < or <<
        if b[i:i + 2] == b"<<":
            d: dict = {}
            i += 2
            while True:
                i = _skip_ws(b, i)
                if b[i:i + 2] == b">>":
                    return d, i + 2
                if b[i:i + 1] != b"/":
                    raise PdfError(f"dict key at {i}")
                k, i = _parse_name(b, i)
                v, i = parse_object(b, i)
                d[str(k)] = v
        return _parse_hex_string(b, i)
    if c == 0x5B:  # [
        arr = []
        i += 1
        while True:
            i = _skip_ws(b, i)
            if b[i:i + 1] == b"]":
                return arr, i + 1
            v, i = parse_object(b, i)
            arr.append(v)
    if b[i:i + 4] == b"true":
        return True, i + 4
    if b[i:i + 5] == b"false":
        return False, i + 5
    if b[i:i + 4] == b"null":
        return None, i + 4
    m = _NUM_RE.match(b, i)
    if m:
        # lookahead for "N G R"
        j = _skip_ws(b, m.end())
        m2 = _REF_TAIL_RE.match(b, j) if b[i:i + 1].isdigit() else None
        if m2 and b"." not in m.group():
            return Ref(int(m.group()), int(m2.group(1))), m2.end()
        s = m.group()
        return (float(s) if b"." in s else int(s)), m.end()
    raise PdfError(f"unparsable object at {i}: {b[i:i+20]!r}")


# ---------------------------------------------------------------------------
# filters
# ---------------------------------------------------------------------------

def _png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    row_len = (colors * bpc * columns + 7) // 8
    bpp = max((colors * bpc + 7) // 8, 1)
    out = bytearray()
    prev = bytearray(row_len)
    pos = 0
    while pos + 1 + row_len <= len(data) + row_len and pos < len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1:pos + 1 + row_len])
        pos += 1 + row_len
        if ft == 1:  # Sub
            for k in range(bpp, len(row)):
                row[k] = (row[k] + row[k - bpp]) & 0xFF
        elif ft == 2:  # Up
            for k in range(len(row)):
                row[k] = (row[k] + prev[k]) & 0xFF
        elif ft == 3:  # Average
            for k in range(len(row)):
                left = row[k - bpp] if k >= bpp else 0
                row[k] = (row[k] + (left + prev[k]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for k in range(len(row)):
                a = row[k - bpp] if k >= bpp else 0
                bb = prev[k]
                cc = prev[k - bpp] if k >= bpp else 0
                p = a + bb - cc
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                pr = a if pa <= pb and pa <= pc else (bb if pb <= pc else cc)
                row[k] = (row[k] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """PDF LZWDecode (9→12-bit codes, EarlyChange=1)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= bits:
            code = (buf >> (nbits - bits)) & ((1 << bits) - 1)
            nbits -= bits
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                bits = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) + 1 >= (1 << bits) and bits < 12:
                bits += 1
    return bytes(out)


def decode_stream(s: Stream, resolve) -> bytes:
    data = s.raw
    filt = resolve(s.d.get("Filter"))
    parms = resolve(s.d.get("DecodeParms") or s.d.get("DP"))
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    parms_l = parms if isinstance(parms, list) else [parms] * len(filters)
    for f, p in zip(filters, parms_l):
        f = str(resolve(f)) if f is not None else ""
        p = resolve(p) or {}
        if f in ("FlateDecode", "Fl"):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                d = zlib.decompressobj()
                try:
                    data = d.decompress(data)
                except zlib.error:
                    return b""
        elif f in ("LZWDecode", "LZW"):
            data = _lzw_decode(data)
        elif f in ("ASCIIHexDecode", "AHx"):
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", data.split(b">")[0])
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode())
        elif f in ("ASCII85Decode", "A85"):
            body = data.split(b"~>")[0].lstrip(b"<~")
            try:
                data = base64.a85decode(re.sub(rb"\s", b"", body))
            except ValueError:
                return b""
        else:
            # image/unknown codec — not text-bearing
            return b""
        pred = int(resolve(p.get("Predictor", 1)) or 1) if isinstance(p, dict) else 1
        if pred >= 10:
            data = _png_predictor(
                data,
                int(resolve(p.get("Colors", 1)) or 1),
                int(resolve(p.get("BitsPerComponent", 8)) or 8),
                int(resolve(p.get("Columns", 1)) or 1),
            )
        elif pred == 2:
            pass  # TIFF predictor: not seen in text streams
    return data


# ---------------------------------------------------------------------------
# document: xref-free object scan + ObjStm expansion + page-tree walk
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


class PdfDocument:
    def __init__(self, data: bytes, password: str = ""):
        if b"%PDF-" not in data[:1024]:
            raise PdfError("not a PDF payload")
        self.data = data
        self.objects: dict[int, object] = {}
        self.gens: dict[int, int] = {}
        self.offsets: dict[int, int] = {}
        self._scan_objects()
        self._decrypt_if_needed(password)
        self._expand_object_streams()

    def _decrypt_if_needed(self, password: str) -> None:
        """Standard-security-handler decryption (engine/pdfcrypto.py):
        locate /Encrypt + /ID in the trailer region, derive the file key
        (empty password first, then the supplied one — PDF viewers'
        behavior), verify via /U, then decrypt every stream and string
        object in place. XRef/ObjStm containers come before expansion so
        compressed objects decode from plaintext; the encrypt dict
        itself stays untouched per spec."""
        # scan ALL /Encrypt-shaped matches and keep the LAST that points
        # at a real encrypt dict — the genuine reference lives in the
        # trailer at EOF (later incremental updates win per spec), and a
        # stray byte pattern inside an earlier stream body must not make
        # an encrypted document silently parse as plaintext garbage
        enc = None
        enc_num = -1
        for m in re.finditer(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", self.data):
            cand_num = int(m.group(1))
            cand = self.objects.get(cand_num)
            if isinstance(cand, Stream):
                cand = cand.d
            if isinstance(cand, dict) and "Filter" in cand:
                enc, enc_num = cand, cand_num
        if enc is None:
            return
        if str(self.resolve(enc.get("Filter"))) != "Standard":
            raise PdfError("unsupported encryption handler")
        idm = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", self.data)
        if idm:
            doc_id = bytes.fromhex(idm.group(1).decode())
        else:
            # literal-string form /ID [(...) (...)] is equally legal
            idl = re.search(rb"/ID\s*\[\s*\(", self.data)
            if idl:
                s, _ = _parse_string(self.data, idl.end() - 1)
                doc_id = s
            else:
                doc_id = b""
        from docling_spark.engine.pdfcrypto import StandardDecryptor

        dec = None
        for pw in ("", password):
            cand = StandardDecryptor(
                {k: self.resolve(v) for k, v in enc.items()}, doc_id, pw)
            if cand.check_user_password(doc_id):
                dec = cand
                break
        if dec is None:
            raise PdfError("wrong or missing PDF password")

        def walk(v, num: int, gen: int):
            if isinstance(v, bytes):
                return dec.decrypt(num, gen, v)
            if isinstance(v, list):
                return [walk(x, num, gen) for x in v]
            if isinstance(v, dict):
                return {k: walk(x, num, gen) for k, x in v.items()}
            return v

        for num, o in self.objects.items():
            if num == enc_num:
                continue
            gen = self.gens.get(num, 0)
            if isinstance(o, Stream):
                t = str(o.d.get("Type"))
                o.d = walk(o.d, num, gen)
                if t != "XRef":  # cross-reference streams are plaintext
                    o.raw = dec.decrypt(num, gen, o.raw)
            else:
                self.objects[num] = walk(o, num, gen)

    # -- plumbing ----------------------------------------------------------

    def resolve(self, o, depth: int = 0):
        while isinstance(o, Ref) and depth < 32:
            o = self.objects.get(o[0])
            depth += 1
        return o

    def _scan_objects(self) -> None:
        data = self.data
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            try:
                obj, end = parse_object(data, m.end())
            except (PdfError, IndexError, RecursionError):
                # garbage bytes inside a stream body can match _OBJ_RE;
                # record gen/offset only for a successful parse or the
                # stray match corrupts this object's decryption key
                # (gens feeds the RC4/AES per-object key) and the
                # ObjStm later-offset-wins shadowing
                continue
            self.gens[num] = int(m.group(2))
            self.offsets[num] = m.start()
            if isinstance(obj, dict):
                sm = _STREAM_RE.match(data, _skip_ws(data, end))
                if sm:
                    start = sm.end()
                    ln = obj.get("Length")
                    if isinstance(ln, Ref):
                        ln = None  # resolve later is circular; search instead
                    if isinstance(ln, int) and \
                            data[start + ln:start + ln + 20].lstrip()[:9] == b"endstream":
                        raw = data[start:start + ln]
                    else:
                        e = data.find(b"endstream", start)
                        raw = data[start:e if e >= 0 else len(data)]
                        raw = raw.rstrip(b"\r\n")
                    obj = Stream(obj, raw)
            # later definitions win (incremental updates append)
            self.objects[num] = obj

    def _expand_object_streams(self) -> None:
        for num in list(self.objects):
            o = self.objects[num]
            if not (isinstance(o, Stream)
                    and str(self.resolve(o.d.get("Type"))) == "ObjStm"):
                continue
            try:
                body = decode_stream(o, self.resolve)
                n = int(self.resolve(o.d.get("N")) or 0)
                first = int(self.resolve(o.d.get("First")) or 0)
                header = body[:first].split()
                container_off = self.offsets.get(num, -1)
                for k in range(n):
                    onum = int(header[2 * k])
                    off = int(header[2 * k + 1])
                    try:
                        obj, _ = parse_object(body, first + off)
                    except (PdfError, IndexError):
                        continue
                    # "later in the file wins" applies to compressed
                    # members too: an incremental update that rewrites an
                    # object INTO an ObjStm must shadow the stale raw
                    # definition left earlier in the file (and vice
                    # versa — a raw update after the stream wins)
                    prior_off = self.offsets.get(onum)
                    if onum not in self.objects or (
                            prior_off is not None
                            and container_off > prior_off):
                        self.objects[onum] = obj
                        self.offsets[onum] = container_off
            except Exception:
                continue

    # -- page tree ----------------------------------------------------------

    def pages(self) -> list[dict]:
        """Ordered page dicts with inherited Resources/MediaBox."""
        root = None
        for o in self.objects.values():
            oo = o.d if isinstance(o, Stream) else o
            if isinstance(oo, dict) and str(self.resolve(oo.get("Type"))) == "Catalog":
                root = oo
        pages_ref = root.get("Pages") if isinstance(root, dict) else None
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node, inherited: dict) -> None:
            node = self.resolve(node)
            if isinstance(node, Stream):
                node = node.d
            if not isinstance(node, dict) or id(node) in seen or len(out) > 5000:
                return
            seen.add(id(node))
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate", "CropBox"):
                if k in node:
                    inh[k] = node[k]
            t = str(self.resolve(node.get("Type")))
            if t == "Pages" or "Kids" in node:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, inh)
            elif t == "Page":
                page = dict(node)
                for k, v in inh.items():
                    page.setdefault(k, v)
                out.append(page)

        if pages_ref is not None:
            walk(pages_ref, {})
        if not out:  # damaged tree: fall back to flat scan, object order
            for o in self.objects.values():
                oo = o.d if isinstance(o, Stream) else o
                if isinstance(oo, dict) and str(self.resolve(oo.get("Type"))) == "Page":
                    out.append(oo)
        return out

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        parts: list[bytes] = []
        for s in c if isinstance(c, list) else [c]:
            s = self.resolve(s)
            if isinstance(s, Stream):
                parts.append(decode_stream(s, self.resolve))
        return b"\n".join(parts)


# ---------------------------------------------------------------------------
# fonts: ToUnicode CMaps, encodings, widths
# ---------------------------------------------------------------------------

# WinAnsiEncoding differences from latin-1 (PDF spec Annex D.2): the
# 0x80-0x9F block carries typographic characters.
_WINANSI = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
    0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ",
}

# Bounded Adobe-glyph-list subset for /Differences names (the names that
# actually occur in text-bearing Latin documents; unknown names fall back
# to their single-char tail or U+FFFD).
_GLYPHS = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "endash": "–", "emdash": "—",
    "bullet": "•", "ellipsis": "…", "fi": "ﬁ",
    "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ",
    "dagger": "†", "daggerdbl": "‡", "periodcentered": "·",
    "degree": "°", "copyright": "©", "registered": "®",
    "trademark": "™", "minus": "−", "multiply": "×",
    "divide": "÷", "plusminus": "±", "germandbls": "ß",
    "adieresis": "ä", "odieresis": "ö", "udieresis": "ü",
    "Adieresis": "Ä", "Odieresis": "Ö", "Udieresis": "Ü",
    "eacute": "é", "egrave": "è", "agrave": "à",
    "ccedilla": "ç", "section": "§", "paragraph": "¶",
    "sterling": "£", "yen": "¥", "cent": "¢",
    "euro": "€", "nbspace": " ", "quotesinglbase": "‚",
    "quotedblbase": "„", "guillemotleft": "«",
    "guillemotright": "»", "guilsinglleft": "‹",
    "guilsinglright": "›", "perthousand": "‰",
    "fraction": "⁄", "florin": "ƒ", "circumflex": "ˆ",
    "tilde": "˜", "breve": "˘", "dotaccent": "˙",
    "ring": "˚", "cedilla": "¸", "hungarumlaut": "˝",
    "ogonek": "˛", "caron": "ˇ", "macron": "¯",
}


def _glyph_to_char(name: str) -> str:
    if name in _GLYPHS:
        return _GLYPHS[name]
    if len(name) == 1:
        return name
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4,6})", name)
    if m:
        try:
            return chr(int(m.group(1), 16))
        except ValueError:
            return "�"
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        try:
            return chr(int(m.group(1), 16))
        except ValueError:
            return "�"
    m = re.fullmatch(r"([A-Za-z])\d+", name)  # g123 / C42 subset names
    if m:
        # docling-parse emits the literal slash-prefixed glyph name for
        # subset-font names with no Unicode meaning ('/g115/g3 /g40...'
        # in the redp5110 groundtruth) — text is preserved as glyph
        # references instead of vanishing into replacement chars
        return f"/{name}"
    return "�"


_CMAP_BFCHAR = re.compile(
    rb"beginbfchar(.*?)endbfchar", re.S)
_CMAP_BFRANGE = re.compile(
    rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_TOK = re.compile(rb"<([0-9A-Fa-f]+)>")
_CODESPACE = re.compile(
    rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.S)


def _utf16_from_hex(hx: bytes) -> str:
    if len(hx) % 2:
        # odd-digit hex string: the spec pads with a trailing zero
        # (7.3.4.3); bytes.fromhex would raise and a raise here blanks
        # every page using the font (pdf_line_cells' per-page guard)
        hx += b"0"
    raw = bytes.fromhex(hx.decode())
    if len(raw) % 2:
        raw += b"\x00"
    try:
        return raw.decode("utf-16-be")
    except UnicodeDecodeError:
        return "�"


def parse_tounicode(cmap: bytes) -> tuple[dict[int, str], int]:
    """(code→text map, code byte width) from a ToUnicode CMap stream."""
    mapping: dict[int, str] = {}
    width = 1
    m = _CODESPACE.search(cmap)
    if m:
        width = max(len(m.group(1)) // 2, 1)
    for block in _CMAP_BFCHAR.findall(cmap):
        toks = _HEX_TOK.findall(block)
        for k in range(0, len(toks) - 1, 2):
            code = int(toks[k], 16)
            width = max(width, len(toks[k]) // 2)
            mapping[code] = _utf16_from_hex(toks[k + 1])
    for block in _CMAP_BFRANGE.findall(cmap):
        # entries: <lo> <hi> <dst>  |  <lo> <hi> [<dst> <dst> ...]
        pos = 0
        entries = re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(\[[^\]]*\]|<[0-9A-Fa-f]+>)", block)
        for lo_h, hi_h, dst in entries:
            lo, hi = int(lo_h, 16), int(hi_h, 16)
            width = max(width, len(lo_h) // 2)
            if hi - lo > 65535:
                continue
            if dst.startswith(b"["):
                dsts = _HEX_TOK.findall(dst)
                for k, code in enumerate(range(lo, hi + 1)):
                    if k < len(dsts):
                        mapping[code] = _utf16_from_hex(dsts[k])
            else:
                base_h = _HEX_TOK.match(dst).group(1)
                if len(base_h) % 2:
                    base_h += b"0"  # spec zero-pad, see _utf16_from_hex
                base_raw = bytes.fromhex(base_h.decode())
                base = int(base_h, 16)
                for code in range(lo, hi + 1):
                    if len(base_raw) <= 2:
                        v = base + (code - lo)
                        if 0xD800 <= v <= 0xDFFF:
                            mapping[code] = "�"
                        else:
                            mapping[code] = chr(v) if v <= 0x10FFFF else "�"
                    else:  # multi-char target: increment last code unit
                        s = _utf16_from_hex(base_h)
                        mapping[code] = s[:-1] + chr(
                            ord(s[-1]) + (code - lo)) if s else "�"
        _ = pos
    return mapping, min(max(width, 1), 2)


class Font:
    __slots__ = ("two_byte", "to_unicode", "diffs", "widths", "default_w",
                 "first_char", "cid_widths", "base", "mac_roman")

    def __init__(self) -> None:
        self.two_byte = False
        self.mac_roman = False
        self.to_unicode: dict[int, str] = {}
        self.diffs: dict[int, str] = {}
        self.widths: list[float | None] | None = None
        self.first_char = 0
        self.default_w = 0.5
        self.cid_widths: dict[int, float] = {}
        self.base = ""

    def decode(self, raw: bytes) -> list[tuple[int, str]]:
        """bytes → [(code, text)] honoring 1- vs 2-byte codes."""
        out: list[tuple[int, str]] = []
        if self.two_byte:
            for k in range(0, len(raw) - 1, 2):
                code = (raw[k] << 8) | raw[k + 1]
                out.append((code, self._char(code)))
            if len(raw) % 2:
                out.append((raw[-1], self._char(raw[-1])))
        else:
            for c in raw:
                out.append((c, self._char(c)))
        return out

    def _char(self, code: int) -> str:
        if code in self.to_unicode:
            return self.to_unicode[code]
        if code in self.diffs:
            return self.diffs[code]
        if 32 <= code < 127:
            return chr(code)
        if self.mac_roman and code >= 128:
            try:
                return bytes([code]).decode("mac_roman")
            except UnicodeDecodeError:
                return ""
        if code in _WINANSI:
            return _WINANSI[code]
        if 0xA0 <= code <= 0xFF:
            return chr(code)
        return ""

    def advance(self, code: int) -> float:
        if self.two_byte:
            return self.cid_widths.get(code, self.default_w)
        if self.widths is not None:
            k = code - self.first_char
            if 0 <= k < len(self.widths):
                w = self.widths[k]
                # an explicit 0 is a real zero-advance glyph (combining
                # accents) — substituting the 0.5 em default would inject
                # phantom pen travel and split words at the gap heuristics
                if w is not None:
                    return w / 1000.0
        return self.default_w


def load_fonts(doc: PdfDocument, page: dict) -> dict[str, Font]:
    res = doc.resolve(page.get("Resources")) or {}
    if isinstance(res, Stream):
        res = res.d
    fonts_d = doc.resolve(res.get("Font")) or {}
    out: dict[str, Font] = {}
    # doc-level cache keyed by the font's indirect reference: a shared
    # CID font's multi-thousand-entry ToUnicode CMap would otherwise be
    # re-decoded once per page and once per Form XObject
    cache = getattr(doc, "_font_cache", None)
    if cache is None:
        cache = doc._font_cache = {}
    for fname, fref in (fonts_d.items() if isinstance(fonts_d, dict) else []):
        key = tuple(fref) if isinstance(fref, Ref) else None
        if key is not None and key in cache:
            out[str(fname)] = cache[key]
            continue
        fd = doc.resolve(fref)
        if isinstance(fd, Stream):
            fd = fd.d
        if not isinstance(fd, dict):
            continue
        f = Font()
        f.base = str(doc.resolve(fd.get("BaseFont")) or "")
        subtype = str(doc.resolve(fd.get("Subtype")) or "")
        tu = doc.resolve(fd.get("ToUnicode"))
        if isinstance(tu, Stream):
            mapping, _width = parse_tounicode(decode_stream(tu, doc.resolve))
            f.to_unicode = mapping
            # NOTE: code width comes from the font TYPE, not the CMap hex
            # digit count — simple (Type1/TrueType/Type3) fonts are 1-byte
            # by spec even when their ToUnicode writes <0041>-style tokens
        if subtype == "Type0":
            f.two_byte = True  # Identity-H/V and CMap encodings: 2-byte
            desc = doc.resolve(fd.get("DescendantFonts"))
            if isinstance(desc, list) and desc:
                d0 = doc.resolve(desc[0])
                if isinstance(d0, Stream):
                    d0 = d0.d
                if isinstance(d0, dict):
                    dw = doc.resolve(d0.get("DW"))
                    f.default_w = (float(dw) / 1000.0) if dw else 1.0
                    warr = doc.resolve(d0.get("W")) or []
                    k = 0
                    warr = [doc.resolve(x) for x in warr]
                    while k < len(warr):
                        c = warr[k]
                        if k + 1 < len(warr) and isinstance(warr[k + 1], list):
                            for j, w in enumerate(warr[k + 1]):
                                w = doc.resolve(w)
                                if isinstance(w, (int, float)):
                                    f.cid_widths[int(c) + j] = float(w) / 1000.0
                            k += 2
                        elif k + 2 < len(warr):
                            c2, w = warr[k + 1], doc.resolve(warr[k + 2])
                            if isinstance(w, (int, float)) and \
                                    isinstance(c2, (int, float)) and \
                                    int(c2) - int(c) <= 65535:
                                for cc in range(int(c), int(c2) + 1):
                                    f.cid_widths[cc] = float(w) / 1000.0
                            k += 3
                        else:
                            break
        else:
            enc = doc.resolve(fd.get("Encoding"))
            if isinstance(enc, Stream):
                enc = enc.d
            if str(enc) == "MacRomanEncoding" or (
                    isinstance(enc, dict)
                    and str(doc.resolve(enc.get("BaseEncoding")))
                    == "MacRomanEncoding"):
                f.mac_roman = True
            if isinstance(enc, dict):
                diffs = doc.resolve(enc.get("Differences")) or []
                code = 0
                for e in diffs:
                    e = doc.resolve(e)
                    if isinstance(e, (int, float)):
                        code = int(e)
                    elif isinstance(e, Name):
                        f.diffs[code] = _glyph_to_char(str(e))
                        code += 1
            fc = doc.resolve(fd.get("FirstChar"))
            f.first_char = int(fc) if isinstance(fc, (int, float)) else 0
            ws = doc.resolve(fd.get("Widths"))
            if isinstance(ws, list):
                # unresolvable entries become None (→ default advance);
                # an explicit 0 stays 0 — a real zero-advance glyph
                f.widths = [
                    (float(rv) if isinstance((rv := doc.resolve(w)),
                                             (int, float)) else None)
                    for w in ws
                ]
        if key is not None:
            cache[key] = f
        out[str(fname)] = f
    return out


# ---------------------------------------------------------------------------
# content-stream interpreter
# ---------------------------------------------------------------------------

def _mat_mul(a, b):
    return (
        a[0] * b[0] + a[1] * b[2],
        a[0] * b[1] + a[1] * b[3],
        a[2] * b[0] + a[3] * b[2],
        a[2] * b[1] + a[3] * b[3],
        a[4] * b[0] + a[5] * b[2] + b[4],
        a[4] * b[1] + a[5] * b[3] + b[5],
    )


_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

_OP_RE = re.compile(
    rb"(?P<str>\()|(?P<hex><(?![<]))|(?P<dict><<)|(?P<arr>\[)"
    rb"|(?P<name>/)|(?P<num>[+-]?(?:\d+\.?\d*|\.\d+))"
    rb"|(?P<op>[A-Za-z'\"][A-Za-z0-9*'\"]*)"
)


class _Run:
    __slots__ = ("x", "y", "w", "size", "text", "glyphs", "page_no")

    def __init__(self, x, y, w, size, text, glyphs, page_no):
        self.x, self.y, self.w, self.size = x, y, w, size
        self.text, self.glyphs, self.page_no = text, glyphs, page_no


def interpret_page(doc: PdfDocument, page: dict, page_no: int,
                   rules_out: list | None = None,
                   images_out: list | None = None) -> tuple[list, tuple]:
    """Content stream → positioned text runs (device space, y up).
    ``rules_out`` (optional) collects painted axis-aligned line segments
    ((x0, y0, x1, y1) device space) — the raw material for ruled-table
    grid detection. ``images_out`` (optional) collects drawn bitmap
    rects ((x0, y0, x1, y1) device space: the image unit square under
    the CTM) — the raw material for picture items."""
    mb = [float(doc.resolve(v) or 0) for v in
          (doc.resolve(page.get("MediaBox")) or [0, 0, 612, 792])]
    page_w, page_h = mb[2] - mb[0], mb[3] - mb[1]
    content = doc.page_content(page)
    runs: list[_Run] = []
    # normalize a non-zero MediaBox origin into the base CTM: downstream
    # geometry (furniture zones, column bands) works in [0, w]x[0, h]
    base = _ID if (mb[0] == 0.0 and mb[1] == 0.0) else \
        (1.0, 0.0, 0.0, 1.0, -mb[0], -mb[1])
    _interpret(doc, content, page.get("Resources"), base, page_no, runs, 0,
               rules_out, images_out)
    return runs, (page_w, page_h)


def _interpret(doc: PdfDocument, content: bytes, resources, base_ctm,
               page_no: int, runs: list, depth: int,
               rules_out: list | None = None,
               images_out: list | None = None) -> None:
    if depth > 8:
        return
    res = doc.resolve(resources) or {}
    if isinstance(res, Stream):
        res = res.d
    fonts = load_fonts(doc, {"Resources": res})
    xobjects = doc.resolve(res.get("XObject")) if isinstance(res, dict) else None

    ctm = base_ctm
    gstack: list[tuple] = []
    tm = lm = _ID
    tf: Font | None = None
    size = tl = tc = tw = 0.0
    th = 1.0
    stack: list = []  # operand stack
    cur_pt = None          # path construction state (user→device at op)
    pending_segs: list = []
    i = 0
    n = len(content)

    def xy(x, y):
        return (ctm[0] * x + ctm[2] * y + ctm[4],
                ctm[1] * x + ctm[3] * y + ctm[5])

    def show(items: list) -> None:
        nonlocal tm
        if tf is None:
            return
        m = _mat_mul(tm, ctm)
        x0 = m[4]
        y0 = m[5]
        eff = abs(size * (tm[3] if tm[3] else 1.0) * (ctm[3] if ctm[3] else 1.0))
        parts: list[str] = []
        prev_code = None
        prev_gx = 0.0
        for it in items:
            if isinstance(it, (int, float)):
                shift = -float(it) / 1000.0 * size * th
                # large negative kern = inter-word gap some generators use
                if float(it) < -180:
                    parts.append(" ")
                    prev_code = None
                # pure x-translation: inline the _mat_mul((1,0,0,1,s,0), tm)
                # special case — this runs once per TJ kern
                tm = (tm[0], tm[1], tm[2], tm[3],
                      shift * tm[0] + tm[4], shift * tm[1] + tm[5])
                continue
            if not isinstance(it, bytes):
                continue
            for code, ch in tf.decode(it):
                wadv = tf.advance(code) * size
                spacing = tc + (tw if code == 32 and not tf.two_byte else 0.0)
                tx = (wadv + spacing) * th
                gx = tm[4]  # pen x (text space) where this glyph draws
                # pure x-translation (per-glyph hot path): inline
                # _mat_mul((1,0,0,1,tx,0), tm)
                tm = (tm[0], tm[1], tm[2], tm[3],
                      tx * tm[0] + tm[4], tx * tm[1] + tm[5])
                # overlapping-duplicate sanitation (the glyph-level dedup
                # docling-parse applies before emitting cells): the same
                # code drawn again before the pen moved 40% of its own
                # advance is a re-draw — kashida elongation pulled back by
                # a large TJ kern (RTL corpus: +88/1000 kerns between
                # 116/1000-wide strokes), or fake-bold double strikes.
                # Normal kerning never retreats a full glyph width, so
                # genuine 'll'/'ww' pairs always pass. The pen delta
                # (gx - prev_gx) lives in tm-applied space (advances
                # accumulate as tx*tm[0]), so the glyph-width threshold
                # must carry the same |tm[0]| scale — otherwise a scaled
                # text matrix (0.2 0 0 0.2 ... Tm) would drop the second
                # glyph of every 'll'/'ee' pair, and tm[0]>1 would never
                # dedup. Rotated text (tm[0]=0) disables the gate: safe.
                if code == prev_code and wadv > 0 and \
                        abs(gx - prev_gx) < 0.4 * wadv * th * abs(tm[0]):
                    continue  # advance applied; duplicate char dropped
                parts.append(ch)
                prev_code = code
                prev_gx = gx
        text = "".join(parts)
        if text.strip():
            m2 = _mat_mul(tm, ctm)
            runs.append(_Run(x0, y0, max(m2[4] - x0, 0.1), max(eff, 0.1),
                             text, parts, page_no))

    while i < n:
        m = _OP_RE.search(content, i)
        if not m:
            break
        i = m.start()
        kind = m.lastgroup
        try:
            if kind == "str":
                s, i = _parse_string(content, i)
                stack.append(s)
            elif kind == "hex":
                s, i = _parse_hex_string(content, i)
                stack.append(s)
            elif kind == "dict":
                d, i = parse_object(content, i)
                stack.append(d)
            elif kind == "arr":
                a, i = parse_object(content, i)
                stack.append(a)
            elif kind == "name":
                nm, i = _parse_name(content, i)
                stack.append(nm)
            elif kind == "num":
                s = m.group()
                stack.append(float(s) if b"." in s else int(s))
                i = m.end()
            else:
                op = m.group()
                i = m.end()
                if op == b"BT":
                    tm = lm = _ID
                elif op == b"ET":
                    pass
                elif op == b"Tm" and len(stack) >= 6:
                    tm = lm = tuple(float(v) for v in stack[-6:])
                elif op == b"Td" and len(stack) >= 2:
                    lm = _mat_mul((1, 0, 0, 1, float(stack[-2]),
                                   float(stack[-1])), lm)
                    tm = lm
                elif op == b"TD" and len(stack) >= 2:
                    tl = -float(stack[-1])
                    lm = _mat_mul((1, 0, 0, 1, float(stack[-2]),
                                   float(stack[-1])), lm)
                    tm = lm
                elif op == b"T*":
                    lm = _mat_mul((1, 0, 0, 1, 0.0, -tl), lm)
                    tm = lm
                elif op == b"TL" and stack:
                    tl = float(stack[-1])
                elif op == b"Tf" and len(stack) >= 2:
                    size = float(stack[-1])
                    tf = fonts.get(str(stack[-2]))
                elif op == b"Tc" and stack:
                    tc = float(stack[-1])
                elif op == b"Tw" and stack:
                    tw = float(stack[-1])
                elif op == b"Tz" and stack:
                    th = float(stack[-1]) / 100.0
                elif op == b"Ts" and stack:
                    pass  # rise: ignored (superscripts stay inline)
                elif op == b"Tj" and stack:
                    show([stack[-1]])
                elif op == b"TJ" and stack:
                    arr = stack[-1]
                    if isinstance(arr, list):
                        show(arr)
                elif op == b"'" and stack:
                    lm = _mat_mul((1, 0, 0, 1, 0.0, -tl), lm)
                    tm = lm
                    show([stack[-1]])
                elif op == b'"' and len(stack) >= 3:
                    tw = float(stack[-3])
                    tc = float(stack[-2])
                    lm = _mat_mul((1, 0, 0, 1, 0.0, -tl), lm)
                    tm = lm
                    show([stack[-1]])
                elif op == b"m" and len(stack) >= 2:
                    cur_pt = xy(float(stack[-2]), float(stack[-1]))
                elif op == b"l" and len(stack) >= 2:
                    p2 = xy(float(stack[-2]), float(stack[-1]))
                    if cur_pt is not None:
                        pending_segs.append((*cur_pt, *p2))
                    cur_pt = p2
                elif op == b"re" and len(stack) >= 4:
                    x0, y0, w0, h0 = (float(v) for v in stack[-4:])
                    a = xy(x0, y0)
                    b2 = xy(x0 + w0, y0)
                    c2 = xy(x0 + w0, y0 + h0)
                    d2 = xy(x0, y0 + h0)
                    pending_segs += [(*a, *b2), (*b2, *c2),
                                     (*c2, *d2), (*d2, *a)]
                    cur_pt = a
                elif op in (b"S", b"s", b"B", b"B*", b"b", b"b*",
                            b"f", b"f*", b"F"):
                    if rules_out is not None:
                        for sg in pending_segs:
                            dx, dy = abs(sg[2] - sg[0]), abs(sg[3] - sg[1])
                            if (dx < 0.7 or dy < 0.7) and max(dx, dy) > 4.0:
                                rules_out.append(sg)
                    pending_segs = []
                    cur_pt = None
                elif op == b"n":
                    pending_segs = []
                    cur_pt = None
                elif op == b"cm" and len(stack) >= 6:
                    ctm = _mat_mul(tuple(float(v) for v in stack[-6:]), ctm)
                elif op == b"q":
                    # the text state (font, size, Tc/Tw/Tz/TL) is part of
                    # the graphics state (PDF 32000 §8.4.2) — saving only
                    # the CTM leaked an inner 'q /F2 Tf ... Q' font into
                    # the text that follows the restore
                    gstack.append((ctm, tf, size, tc, tw, th, tl))
                elif op == b"Q":
                    if gstack:
                        ctm, tf, size, tc, tw, th, tl = gstack.pop()
                elif op == b"BI":
                    if images_out is not None:
                        images_out.append(_unit_rect(ctm))
                    # inline image: skip past EI. The raw sample data can
                    # contain the byte pair 'EI', so require whitespace on
                    # both sides (the spec's operator delimiting) — a bare
                    # find() could resume the tokenizer mid-binary and a
                    # stray '(' would then swallow real operators
                    e = content.find(b"EI", i)
                    while e >= 0 and not (
                        (e == 0 or content[e - 1:e] in _WS)
                        and (e + 2 >= n or content[e + 2:e + 3] in _WS)
                    ):
                        e = content.find(b"EI", e + 2)
                    i = e + 2 if e >= 0 else n
                elif op == b"Do" and stack and isinstance(xobjects, dict):
                    xo = doc.resolve(xobjects.get(str(stack[-1])))
                    if isinstance(xo, Stream) and \
                            str(doc.resolve(xo.d.get("Subtype"))) \
                            == "Image" and images_out is not None:
                        # bitmap draw: the image fills the unit square
                        # under the current CTM
                        images_out.append(_unit_rect(ctm))
                    if isinstance(xo, Stream) and \
                            str(doc.resolve(xo.d.get("Subtype"))) == "Form":
                        fm = doc.resolve(xo.d.get("Matrix")) or \
                            [1, 0, 0, 1, 0, 0]
                        inner_ctm = _mat_mul(
                            tuple(float(doc.resolve(v) or 0) for v in fm),
                            ctm)
                        _interpret(
                            doc, decode_stream(xo, doc.resolve),
                            xo.d.get("Resources") or res, inner_ctm,
                            page_no, runs, depth + 1, rules_out,
                            images_out)
                stack.clear()
        except (PdfError, IndexError, ValueError, TypeError):
            stack.clear()
            i = m.end() if m.end() > i else i + 1


def _cluster_image_rects(rects: list, gap: float = 10.0) -> list:
    """Merge drawn-bitmap rects whose gap-expanded boxes touch into
    maximal cluster boxes — generators routinely compose ONE visual
    figure from several bitmap tiles (sliced photos, logo + art), and
    the reference's layout model emits one picture region per figure.
    Greedy fixpoint; n is tiny (images per page, not text runs)."""
    boxes = [list(r) for r in rects]
    changed = True
    while changed:
        changed = False
        out: list = []
        for b in boxes:
            merged = False
            for o in out:
                if (b[0] - gap <= o[2] and b[2] + gap >= o[0]
                        and b[1] - gap <= o[3] and b[3] + gap >= o[1]):
                    o[0] = min(o[0], b[0]); o[1] = min(o[1], b[1])
                    o[2] = max(o[2], b[2]); o[3] = max(o[3], b[3])
                    merged = changed = True
                    break
            if not merged:
                out.append(b)
        boxes = out
    return [tuple(b) for b in boxes]


def _unit_rect(ctm) -> tuple:
    """Device-space bounding rect of the unit square under a CTM."""
    pts = [(ctm[4], ctm[5]),
           (ctm[0] + ctm[4], ctm[1] + ctm[5]),
           (ctm[2] + ctm[4], ctm[3] + ctm[5]),
           (ctm[0] + ctm[2] + ctm[4], ctm[1] + ctm[3] + ctm[5])]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return (min(xs), min(ys), max(xs), max(ys))


# ---------------------------------------------------------------------------
# runs → line cells → shared layout pipeline
# ---------------------------------------------------------------------------

_RTL_CHAR = re.compile(r"[֐-ࣿיִ-﷿ﹰ-﻿]")

_LETTER_RE = re.compile(r"[^\W\d_]")


def _rtl_dominant(text: str) -> bool:
    """True when a strict majority of the letters are RTL-script chars —
    the single dominance rule shared by the bidi line fix, the line
    splitter, and the ruled-table bail-out."""
    letters = _LETTER_RE.findall(text)
    return bool(letters) and sum(
        1 for ch in letters if _RTL_CHAR.match(ch)) * 2 > len(letters)
_WSRUN_RE = re.compile(r"\s+")
_DIGITRUN_RE = re.compile(r"\d+")
_LTR_SEG = re.compile(r"[A-Za-z0-9][A-Za-z0-9 .,:/%-]*[A-Za-z0-9]|[A-Za-z0-9]")
_MIRROR = str.maketrans("()[]{}<>", ")(][}{><")
# script-boundary word gap: Arabic/Hebrew orthography never joins an
# RTL letter directly to a Latin letter or digit within one word, so a
# zero-width boundary between the two scripts is a lost inter-word
# space (the RTL corpus renders e.g. 'Python لتنفيذ' with the space
# glyph carried by a NEIGHBORING run whose geometry puts it elsewhere
# on the line — the words themselves touch at 0.05 pt)
_SCRIPT_SEAM = re.compile(
    r"([֐-ࣿיִ-﷿ﹰ-﻿])(?=[A-Za-z0-9])"
    r"|([A-Za-z0-9])(?=[֐-ࣿיִ-﷿ﹰ-﻿])")


def _fix_rtl(glyphs: list[str]) -> str:
    """Visual→logical order for RTL-dominant lines. PDF content streams
    store RTL text in visual (left-to-right glyph) order; the reference's
    native parsers emit logical order (right_to_left_0x groundtruth).
    Reversal happens at GLYPH granularity: a ligature glyph (e.g.
    lam-alef) maps through ToUnicode to its logical char pair at one
    visual position, so its internal order must survive the line flip -
    char-level reversal is provably ambiguous (a visual lam+alef
    substring is a ligature mid-word but a reversed article at word
    ends). Embedded LTR (latin/digit) runs are un-reversed afterwards;
    paired brackets mirror."""
    text = "".join(glyphs)
    if not _rtl_dominant(text):
        return text
    rev = "".join(
        g if len(g) > 1 else g.translate(_MIRROR)
        for g in reversed(glyphs)
    )
    logical = _LTR_SEG.sub(lambda m: m.group()[::-1], rev)
    # restore the inter-word space at bare RTL↔LTR seams (see
    # _SCRIPT_SEAM): the two scripts never share a word, so a direct
    # juncture is a dropped separator, not a joined token
    return _SCRIPT_SEAM.sub(lambda m: m.group() + " ", logical)


def _column_edges(runs: list[_Run], lines: list[list[_Run]]) -> list[float]:
    """Column left edges: x positions (2 pt buckets) where a large share
    of the page's baselines have a run START that is not the line's own
    left margin. The leftmost margin is excluded — only interior edges
    (i.e. second+ columns) are returned."""
    if len(lines) < 8:
        return []
    from collections import Counter

    starts = Counter()
    for r in runs:
        starts[round(r.x / 2.0) * 2.0] += 1
    if not starts:
        return []
    min_x = min(starts)
    thr = max(5, int(len(lines) * 0.30))
    return [x for x, n in starts.items()
            if n >= thr and x > min_x + 50.0]


def _runs_to_lines(runs: list[_Run], page_h: float) -> list[dict]:
    """Group positioned runs into text-line cells (top-left-origin bboxes,
    the shape layoutx consumes). Baseline clustering: runs whose baselines
    sit within 40% of the font size belong to one line; within a line,
    x-sorted runs join, inserting a space when the gap exceeds 25% of the
    font size (the pdfium/parse heuristic class)."""
    if not runs:
        return []
    runs = sorted(runs, key=lambda r: (-r.y, r.x))
    lines: list[list[_Run]] = []
    for r in runs:
        placed = False
        for line in reversed(lines[-8:]):
            ref = line[0]
            tol = max(ref.size, r.size) * 0.4
            if abs(ref.y - r.y) <= tol:
                line.append(r)
                placed = True
                break
        if not placed:
            lines.append([r])
    cells: list[dict] = []
    edges = _column_edges(runs, lines)
    split_lines: list[list[_Run]] = []
    for line in lines:
        line.sort(key=lambda r: r.x)
        # split a baseline into separate cells at (a) gaps much wider
        # than the type size (borderless table cells), or (b) a detected
        # column left edge — justified two-column pages can have gutters
        # of only ~8 pt, indistinguishable from wide word spacing by gap
        # size alone, but the column edge shows up as a spike of run
        # start positions across the page (see _column_edges); joining
        # across the gutter interleaves two-column text irrecoverably
        joined = "".join(r.text for r in line)
        if _rtl_dominant(joined):
            # RTL lines read right-to-left across any gap — splitting
            # would re-order the fragments left-to-right downstream
            split_lines.append(line)
            continue
        cur: list[_Run] = []
        prev = None
        for r in line:
            gap = r.x - (prev.x + prev.w) if prev is not None else 0.0
            at_edge = prev is not None and gap > 1.5 and any(
                abs(r.x - e) <= 2.0 for e in edges)
            # a run need not START at the column edge to be in the next
            # column — indented paragraph openers and section-number
            # headings start past it. If the inter-run gap STRADDLES a
            # detected edge and is at least 1.5x the type size (word
            # spaces are 0.25-0.5x unjustified; justified lines stretch
            # them, but rarely past 1.5 em — and the gutter-crossing
            # mis-merges this rule targets measured 2x+), the two runs
            # are in different columns and joining would interleave
            # them.
            straddles = prev is not None and \
                gap >= max(prev.size, r.size) * 1.5 and any(
                    prev.x + prev.w <= e + 2.0 and r.x >= e - 2.0
                    for e in edges)
            if prev is not None and (
                    gap > max(prev.size, r.size) * 2.5 or at_edge
                    or straddles):
                split_lines.append(cur)
                cur = []
            cur.append(r)
            prev = r
        split_lines.append(cur)
    for line in split_lines:
        glyphs: list[str] = []
        prev_end = None
        # RTL-dominant lines use a tighter word-gap threshold (0.20 vs
        # 0.25 em): measured on the RTL corpus, genuine Arabic
        # inter-word run gaps sit at ~0.248 em — just under the LTR
        # threshold — while cursive intra-word glyphs connect at ~0 gap,
        # so the lower cut gains separators without false splits
        sep_frac = 0.20 if _rtl_dominant(
            "".join(r.text for r in line)) else 0.25
        for r in line:
            if prev_end is not None:
                gap = r.x - prev_end
                if gap > max(r.size, 1.0) * sep_frac and glyphs and \
                        glyphs[-1] != " ":
                    glyphs.append(" ")
            glyphs.extend(r.glyphs)
            prev_end = r.x + r.w
        # collapse whitespace at the glyph level: boundaries must survive
        # into the bidi pass (a lam-alef ligature is ONE glyph whose two
        # logical chars must not be flipped by the line reversal)
        norm: list[str] = []
        for g in glyphs:
            g2 = _WSRUN_RE.sub(" ", g)
            if g2 == " " and (not norm or norm[-1] == " "):
                continue
            if g2:
                norm.append(g2)
        while norm and norm[-1] == " ":
            norm.pop()
        if not norm:
            continue
        text = _fix_rtl(norm)
        x0 = min(r.x for r in line)
        x1 = max(r.x + r.w for r in line)
        sz = max(r.size for r in line)
        base = max(r.y for r in line)
        cells.append(
            {
                "page_no": line[0].page_no,
                # top-left origin: t = page_h - (baseline + ascent)
                "bbox": (x0, page_h - (base + 0.8 * sz),
                         x1, page_h - (base - 0.2 * sz)),
                "text": text,
                "conf": 1.0,
                "label": "text",
            }
        )
    return cells


def pdf_line_cells(payload: "bytes | PdfDocument",
                   password: str = "") -> tuple[list[dict], dict[int, tuple]]:
    """PDF bytes → (text-line cells, page sizes) — the native-parser
    contract the reference gets from docling-parse (per-line TextCells +
    page geometry), fed to ``layoutx.extract_from_cells``. Accepts a
    pre-built :class:`PdfDocument` so a caller extracting both text and
    hyperlinks parses the file once."""
    doc = (payload if isinstance(payload, PdfDocument)
           else PdfDocument(payload, password=password))
    pages = doc.pages()
    if not pages:
        raise PdfError("no pages")
    cells: list[dict] = []
    page_sizes: dict[int, tuple] = {}
    page_images: dict[int, list] = {}
    for pno, page in enumerate(pages, start=1):
        rules: list = []
        images: list = []
        try:
            runs, (pw, ph) = interpret_page(doc, page, pno,
                                            rules_out=rules,
                                            images_out=images)
        except Exception:
            runs, (pw, ph) = [], (612.0, 792.0)
        page_sizes[pno] = (pw, ph)
        page_images[pno] = images
        tcells: list[dict] = []
        try:
            tcells, consumed = detect_ruled_tables(rules, runs, ph)
        except Exception:
            consumed = set()
        if tcells:
            runs = [r for k, r in enumerate(runs) if k not in consumed]
        line_cells = _absorb_text_on_bitmaps(
            _runs_to_lines(runs, ph), images, (pw, ph))
        rcells: list[dict] = []
        if not tcells:
            # rail (borderless) detection only where no ruled grid fired:
            # a page with a reconstructed ruled table keeps its remaining
            # text as lines, and mixing the two detectors on one page
            # risks re-consuming a ruled table's caption zone
            try:
                rcells, rconsumed = detect_rail_tables(line_cells)
            except Exception:
                rcells, rconsumed = [], set()
            if rcells:
                line_cells = [c for k, c in enumerate(line_cells)
                              if k not in rconsumed]
        cells.extend(line_cells)
        cells.extend(tcells)
        cells.extend(rcells)
    cells.extend(_picture_cells(page_images, page_sizes, len(pages)))
    _mark_repeated_furniture(cells, page_sizes, len(pages))
    for k, c in enumerate(cells):
        c["index"] = k
    return cells, page_sizes


def _absorb_text_on_bitmaps(line_cells: list[dict], images: list,
                            page_size: tuple) -> list[dict]:
    """Drop text lines drawn ON a bitmap (≥80% of the line inside one
    drawn image rect) — the reference's layout postprocessor absorbs
    text cells into the picture cluster that contains them, so banner
    titles and text baked into figures never reach the md (its
    groundtruth omits them). Two deliberate limits: containment is
    tested against INDIVIDUAL image draws, never a cluster union (text
    BETWEEN the tiles of a composed figure is real content), and
    near-full-page images absorb nothing (scanned/OCR pages carry their
    whole text layer over a page-sized background bitmap)."""
    pw, ph = page_size
    page_area = max(pw * ph, 1e-9)
    # adversarial bound: a crafted page stroking tens of thousands of
    # images would make this containment pass (tiles x lines) and the
    # cluster fixpoint quadratic wall-time bombs. Real pages draw a
    # handful of bitmaps; past the cap the page keeps ALL its text
    # (degrade = absorb nothing, never drop content)
    if len(images) > 512:
        return line_cells
    tiles = []
    covered = 0.0
    seen_rects: set = set()
    for r in images:
        # dedup identical draws BEFORE the coverage sum: one modest
        # figure re-stroked many times must not fake page-blanket
        # coverage and disable absorption for the whole page
        key = tuple(round(v, 1) for v in r)
        if key in seen_rects:
            continue
        seen_rects.add(key)
        w, h = r[2] - r[0], r[3] - r[1]
        if w < 8.0 or h < 8.0:
            continue
        if (w * h) / page_area >= 0.90:
            continue  # background bitmap of a scanned page
        covered += max(w, 0.0) * max(h, 0.0)
        # device y-up → top-left-origin, like the line cells
        tiles.append((r[0], ph - r[3], r[2], ph - r[1]))
    if not tiles:
        return line_cells
    # scanners routinely emit a page scan as SEVERAL strips, each under
    # the single-bitmap 90% guard; when the tiles together blanket the
    # page, they are its background, and absorbing would delete the
    # whole OCR text layer. Summed area over-counts overlap, so this
    # errs toward keeping text — the safe direction.
    if covered / page_area >= 0.90:
        return line_cells
    kept = []
    for c in line_cells:
        l, t, r_, b = c["bbox"]
        area = max((r_ - l) * (b - t), 1e-9)
        absorbed = False
        for tl, tt, tr, tb in tiles:
            il, it = max(l, tl), max(t, tt)
            ir, ib = min(r_, tr), min(b, tb)
            if ir > il and ib > it and \
                    (ir - il) * (ib - it) >= 0.8 * area:
                absorbed = True
                break
        if not absorbed:
            kept.append(c)
    return kept


def _picture_cells(page_images: dict[int, list],
                   page_sizes: dict[int, tuple],
                   n_pages: int) -> list[dict]:
    """Drawn-bitmap rects → picture cells (the md serializer's
    ``<!-- image -->`` placeholders, matching the reference pipeline's
    picture regions).

    Rules, all derived from what the reference's layout model produces
    on the groundtruth corpus: exact-duplicate draws dedup (tiled
    backgrounds re-stroke one XObject); rects tile into one figure via
    :func:`_cluster_image_rects`; sub-8-pt boxes are decoration, not
    figures; a cluster whose ROUNDED position repeats on ≥3 pages is a
    running banner/logo — furniture the reference's md omits (the
    picture twin of the repeated-text header rule); full-page covers are
    handled downstream by drop_full_page_pictures."""
    clustered: dict[int, list] = {}
    pos_pages: dict[tuple, set] = {}
    for pno, imgs in page_images.items():
        seen: set = set()
        rects = []
        for r in imgs:
            k = tuple(round(v, 1) for v in r)
            if k in seen:
                continue
            seen.add(k)
            rects.append(r)
        if len(rects) > 512:
            # crafted image-bomb page: the cluster fixpoint is quadratic
            # in draw count — emit no picture items rather than stall
            # (text extraction is unaffected)
            clustered[pno] = []
            continue
        boxes = [
            b for b in _cluster_image_rects(rects, gap=0.0)
            if b[2] - b[0] >= 8.0 and b[3] - b[1] >= 8.0
        ]
        clustered[pno] = boxes
        for b in boxes:
            key = tuple(round(v) for v in b)
            pos_pages.setdefault(key, set()).add(pno)
    out: list[dict] = []
    for pno, boxes in clustered.items():
        ph = page_sizes.get(pno, (612.0, 792.0))[1] or 792.0
        for b in boxes:
            if n_pages >= 3 and \
                    len(pos_pages[tuple(round(v) for v in b)]) >= 3:
                continue  # repeated-position banner/logo
            out.append({
                "page_no": pno,
                # device y-up → top-left-origin like every other cell
                "bbox": (b[0], ph - b[3], b[2], ph - b[1]),
                "text": "",
                "conf": 1.0,
                "label": "picture",
            })
    return out


def _mark_repeated_furniture(cells: list[dict],
                             page_sizes: dict[int, tuple],
                             n_pages: int) -> None:
    """Rule-based header/footer detection (the deterministic core of what
    the reference's layout model labels page_header/page_footer; its md
    serializer then omits them — mirrored by layoutx FURNITURE_LABELS).

    Headers: a line whose digit-normalized text repeats on ≥3 pages AND
    sits in the page's top 8% — repetition is required because titles and
    section headings legitimately START in the top zone.

    Footers: a text line that STARTS in the bottom 8% (top ≥ 0.92·h)
    AND is vertically DETACHED from the body above it (gap ≥ 1.5× the
    page's median line height, measured on the r4 groundtruth survey:
    real footers sit 17-193 pt below the last body line, while a body
    continuation line follows its predecessor within a few points).
    What passes both gates is page numbers, copyright lines, publisher
    address/ISSN metadata, and one-off footnote markers — which the
    reference's model excludes from md in every groundtruth doc, while
    everything it keeps (figure captions, URL footnotes) sits above the
    zone. The detachment gate keeps the rule safe on tight-margin
    layouts whose last body line starts inside the band; the r3
    repetition requirement (which left single-occurrence footers inline)
    stays only for headers."""
    counts: dict[str, set[int]] = {}
    if n_pages >= 3:
        for c in cells:
            key = _DIGITRUN_RE.sub("#", c["text"]).strip()
            if key:
                counts.setdefault(key, set()).add(c["page_no"])
    by_page: dict[int, list[dict]] = {}
    for c in cells:
        by_page.setdefault(c["page_no"], []).append(c)

    def _zone_detached(pc: list[dict], ph: float) -> "set[int]":
        """ids of bottom-zone text cells detached from the body. Walked
        top-down per candidate: a candidate whose gap to the content
        above (body, or an earlier candidate that proved to BE body) is
        under the threshold is a body continuation line; once one
        candidate detaches, everything below it detaches with it — so a
        stacked footer block (address + tel + ISSN lines) qualifies as a
        unit, while a tight-margin page keeps its last body lines AND
        still sheds a genuinely detached page number further down."""
        cand = sorted(
            (c for c in pc
             if c["label"] == "text" and c["bbox"][1] >= 0.92 * ph),
            key=lambda c: c["bbox"][1])
        if not cand:
            return set()
        cand_ids = {id(c) for c in cand}
        hs = sorted(x["bbox"][3] - x["bbox"][1] for x in pc)
        med_h = hs[len(hs) // 2] if hs else 12.0
        thr = 1.5 * max(med_h, 1.0)
        body_bots = [x["bbox"][3] for x in pc if id(x) not in cand_ids]
        out: set[int] = set()
        detached = False
        for c in cand:
            if detached:
                out.add(id(c))
                continue
            above = [b for b in body_bots if b <= c["bbox"][1] + 1.0]
            gap = c["bbox"][1] - max(above) if above else float("inf")
            if gap >= thr:
                detached = True
                out.add(id(c))
            else:
                # body continuation: its own bottom now shields the
                # candidates below it like any other body line
                body_bots.append(c["bbox"][3])
        return out

    zone_ok: set[int] = set()
    for pno, pc in by_page.items():
        ph = page_sizes.get(pno, (612.0, 792.0))[1] or 792.0
        zone_ok |= _zone_detached(pc, ph)

    def _footerish_text(text: str) -> bool:
        """Corroboration for single-page documents: purely geometric
        detachment is unsafe there (a detached final line can be a
        signature block, dateline, or closing quote), so require the
        text to look like furniture — digit-heavy or carrying a page/
        ISSN/copyright marker, the shape of real single-page footers."""
        t = text.strip()
        if not t:
            return True
        digits = sum(ch.isdigit() for ch in t)
        return (digits / len(t) >= 0.25
                or (len(t) <= 6 and digits > 0)
                or "issn" in t.lower() or "©" in t
                or t.lower().startswith(("page ", "copyright")))

    if n_pages < 2 and zone_ok:
        # the detached block relabels as a UNIT (address + tel + ISSN
        # stacks), so corroborate at block level: one footerish line
        # vouches for its whole page's block; none → leave the block
        # inline (it is prose, not furniture)
        vouched = {c["page_no"] for c in cells
                   if id(c) in zone_ok and _footerish_text(c["text"])}
        zone_ok = {i for c in cells for i in (id(c),)
                   if i in zone_ok and c["page_no"] in vouched}

    for c in cells:
        ph = page_sizes.get(c["page_no"], (612.0, 792.0))[1] or 792.0
        top, bot = c["bbox"][1], c["bbox"][3]
        if id(c) in zone_ok:
            c["label"] = "page_footer"
            continue
        if n_pages < 3:
            continue
        key = _DIGITRUN_RE.sub("#", c["text"]).strip()
        if len(counts.get(key, ())) < 3:
            continue
        if bot <= 0.08 * ph:
            c["label"] = "page_header"
        elif top >= 0.92 * ph:
            c["label"] = "page_footer"


def extract_pdf(payload: bytes,
                password: str = "") -> tuple[str, list[dict], dict]:
    """PDF bytes → (extracted_text, items, metrics) through the shared
    layout tail (filters → dedup → reading order → tables → paragraphs)."""
    from docling_spark.engine.layoutx import extract_from_cells

    cells, page_sizes = pdf_line_cells(payload, password=password)
    return extract_from_cells(cells, page_sizes)


# ---------------------------------------------------------------------------
# outline (PDF bookmarks → heading-hierarchy signal)
# ---------------------------------------------------------------------------

def pdf_hyperlinks(payload: "bytes | PdfDocument",
                   password: str = "") -> list[dict]:
    """Link annotations: [{page_no, l, t, r, b, uri}] in TOP-LEFT-origin
    page coordinates.

    The reference gets hyperlink rects from docling-parse's SegmentedPage
    (``parsed_page.hyperlinks``, consumed by
    docling/models/stages/page_assemble/page_assemble_model.py:69-110);
    this is the from-scratch twin over our own object model: each page's
    ``/Annots`` array, ``/Subtype /Link`` entries only, ``/Rect``
    normalized (the spec allows any corner order) and flipped from the
    PDF's bottom-left origin via the page height, URI taken from the
    ``/A`` action when ``/S /URI`` (GoTo/internal destinations carry no
    URI and are the outline walker's job, not a hyperlink).

    Accepts a pre-built :class:`PdfDocument` (like :func:`pdf_outline`)
    so callers that already parsed the bytes for text extraction don't
    pay the object scan / decryption / page-tree walk twice per row.
    A damaged page degrades to zero links for that page, mirroring
    :func:`pdf_line_cells`'s per-page containment.
    """
    doc = (payload if isinstance(payload, PdfDocument)
           else PdfDocument(payload, password=password))
    out: list[dict] = []
    for pno, page in enumerate(doc.pages(), start=1):
        try:
            mb = [float(doc.resolve(v) or 0) for v in
                  (doc.resolve(page.get("MediaBox")) or [0, 0, 612, 792])]
            if len(mb) < 4:
                mb = [0, 0, 612, 792]  # damaged box → letter default
        except (TypeError, ValueError):
            mb = [0, 0, 612, 792]
        page_h = mb[3] - mb[1]
        annots = doc.resolve(page.get("Annots"))
        if not isinstance(annots, list):
            continue
        for a in annots:
            a = doc.resolve(a)
            if isinstance(a, Stream):
                a = a.d
            if not isinstance(a, dict) or \
                    str(doc.resolve(a.get("Subtype"))) != "Link":
                continue
            rect = doc.resolve(a.get("Rect"))
            if not isinstance(rect, list) or len(rect) != 4:
                continue
            try:
                x0, y0, x1, y1 = (float(doc.resolve(v)) - off
                                  for v, off in zip(rect, (mb[0], mb[1],
                                                           mb[0], mb[1])))
            except (TypeError, ValueError):
                continue
            l, r = min(x0, x1), max(x0, x1)
            yb, yt = min(y0, y1), max(y0, y1)
            act = doc.resolve(a.get("A"))
            if isinstance(act, Stream):
                act = act.d
            if not isinstance(act, dict) or \
                    str(doc.resolve(act.get("S"))) != "URI":
                continue
            uri = doc.resolve(act.get("URI"))
            if isinstance(uri, bytes):
                uri = _pdf_text_string(uri)
            if not uri:
                continue
            out.append({
                "page_no": pno,
                "l": l, "t": page_h - yt, "r": r, "b": page_h - yb,
                "uri": str(uri),
            })
    return out


def _pdf_text_string(raw: bytes) -> str:
    """PDF text-string decode: UTF-16BE with BOM, else PDFDoc≈latin-1."""
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            return raw[2:].decode("latin-1", "replace")
    if raw[:3] == b"\xef\xbb\xbf":
        return raw[3:].decode("utf-8", "replace")
    return raw.decode("latin-1")


def pdf_outline(doc: PdfDocument) -> list[dict]:
    """Flat document-ordered outline: [{title, level, page_no, y_top}].

    The analog of the reference's pdfium/docling-parse outline readers
    (docling/utils/pdf_outline.py): titles text-decoded, destinations
    resolved to 1-based page numbers, vertical target converted to
    top-left origin. Missing/damaged outlines yield []."""
    # page object-number → 1-based index (for /Dest page refs)
    page_index: dict[int, int] = {}
    heights: dict[int, float] = {}
    root = None
    for num, o in doc.objects.items():
        oo = o.d if isinstance(o, Stream) else o
        if isinstance(oo, dict):
            t = str(doc.resolve(oo.get("Type")))
            if t == "Catalog":
                root = oo
            elif t == "Page":
                page_index[num] = len(page_index) + 1
    # rebuild in true page-tree order
    if root is not None:
        ordered: list[int] = []

        def walk(ref) -> None:
            node = doc.resolve(ref)
            if isinstance(node, Stream):
                node = node.d
            if not isinstance(node, dict) or len(ordered) > 5000:
                return
            if "Kids" in node:
                for kid in doc.resolve(node.get("Kids")) or []:
                    walk(kid)
            elif str(doc.resolve(node.get("Type"))) == "Page":
                if isinstance(ref, Ref):
                    ordered.append(ref[0])
                    mb = doc.resolve(node.get("MediaBox"))
                    if isinstance(mb, list) and len(mb) == 4:
                        heights[ref[0]] = float(doc.resolve(mb[3]) or 792) \
                            - float(doc.resolve(mb[1]) or 0)

        walk(root.get("Pages"))
        if ordered:
            page_index = {num: i + 1 for i, num in enumerate(ordered)}
    if root is None:
        return []

    # named destinations (simple /Dests dict + /Names tree leaves)
    named: dict[str, object] = {}
    dests = doc.resolve(root.get("Dests"))
    if isinstance(dests, dict):
        named.update(dests)
    names_root = doc.resolve(root.get("Names"))
    if isinstance(names_root, dict):
        def walk_names(node, depth=0) -> None:
            node = doc.resolve(node)
            if not isinstance(node, dict) or depth > 16:
                return
            for kid in doc.resolve(node.get("Kids")) or []:
                walk_names(kid, depth + 1)
            arr = doc.resolve(node.get("Names")) or []
            for k in range(0, len(arr) - 1, 2):
                key = doc.resolve(arr[k])
                if isinstance(key, bytes):
                    key = _pdf_text_string(key)
                named[str(key)] = arr[k + 1]

        walk_names(names_root.get("Dests"))

    def resolve_dest(d) -> tuple[int | None, float | None]:
        d = doc.resolve(d)
        if isinstance(d, (bytes, Name, str)):
            key = _pdf_text_string(d) if isinstance(d, bytes) else str(d)
            d = doc.resolve(named.get(key))
        if isinstance(d, dict):
            d = doc.resolve(d.get("D"))
        if not isinstance(d, list) or not d:
            return None, None
        pref = d[0]
        pno = page_index.get(pref[0]) if isinstance(pref, Ref) else (
            int(pref) + 1 if isinstance(pref, (int, float)) else None)
        y_top = None
        if len(d) >= 4 and str(doc.resolve(d[1])) == "XYZ":
            y = doc.resolve(d[3])
            if isinstance(y, (int, float)) and isinstance(pref, Ref):
                y_top = heights.get(pref[0], 792.0) - float(y)
        return pno, y_top

    out: list[dict] = []

    def walk_outline(item, level: int, seen: set) -> None:
        item = doc.resolve(item)
        if isinstance(item, Stream):
            item = item.d
        if not isinstance(item, dict) or id(item) in seen or len(out) > 2000:
            return
        seen.add(id(item))
        title = item.get("Title")
        title = doc.resolve(title)
        if isinstance(title, bytes):
            text = _pdf_text_string(title).strip()
            if text:
                dest = item.get("Dest")
                if dest is None:
                    a = doc.resolve(item.get("A"))
                    dest = a.get("D") if isinstance(a, dict) else None
                pno, y_top = resolve_dest(dest)
                out.append({"title": text, "level": level,
                            "page_no": pno, "y_top": y_top})
        if "First" in item:
            walk_outline(item["First"], level + 1 if "Title" in item else level,
                         seen)
        if "Next" in item:
            walk_outline(item["Next"], level, seen)

    outlines = doc.resolve(root.get("Outlines"))
    if isinstance(outlines, Stream):
        outlines = outlines.d
    if isinstance(outlines, dict) and "First" in outlines:
        walk_outline(outlines["First"], 0, set())
    return out


# ---------------------------------------------------------------------------
# ruled-table detection (vector grid lines → table_cell cells)
# ---------------------------------------------------------------------------

def _cluster(vals: list[float], tol: float) -> list[float]:
    out: list[list[float]] = []
    for v in sorted(vals):
        if out and v - out[-1][-1] <= tol:
            out[-1].append(v)
        else:
            out.append([v])
    return [sum(g) / len(g) for g in out]


def detect_rail_tables(line_cells: list[dict]) -> tuple[list[dict], set[int]]:
    """Borderless-table detection from whitespace rails — the r4 step of
    what the reference's TableFormer model recovers when a table has no
    ruling lines (table_structure_model.py): column LEFT edges shared by
    a block of consecutive baselines become rails; the baselines become
    rows.

    Deliberately conservative (the false-positive mode — swallowing page
    columns into a phantom table — is worse than the miss mode, which
    just leaves text inline). The anchor is a CORE: >=3 consecutive
    baselines whose fragment left-edge signatures are IDENTICAL with
    >=3 columns — a pattern running body text (one or two fragments per
    line-half: text, or marker+text) never produces. The core fixes the
    rails and the x-extent; neighboring baselines then join as rows only
    when every fragment they have INSIDE the extent starts on a rail
    (fragments outside — e.g. the other half of a 2-up page sharing the
    baseline — are ignored and never consumed). Up to two baselines
    above join as ONE header row when their fragments lie inside the
    extent (centered headers don't start on rails; they map to columns
    by max x-overlap, and a stacked two-line header merges — "State
    funded" over "legal aid" is one header cell).

    Works on the ALREADY-SPLIT line cells (the baseline splitter breaks
    at gaps > 2.5x type size, so table cells arrive as separate
    fragments). Returns (table_cell dicts, consumed line-cell indices);
    emitted bboxes are grid-aligned so layoutx._assemble_tables clusters
    rows/columns exactly like the ruled path's output.
    """
    if len(line_cells) < 9:
        return [], set()
    order = sorted(range(len(line_cells)),
                   key=lambda k: (line_cells[k]["bbox"][1],
                                  line_cells[k]["bbox"][0]))
    baselines: list[list[int]] = []
    for k in order:
        t = line_cells[k]["bbox"][1]
        # chain on the previous CELL's top, not the group's first — 2-up
        # pages interleave two half-page layouts whose baselines sit a
        # couple of points apart, and first-anchored grouping splits one
        # visual row into two
        if baselines and \
                t - line_cells[baselines[-1][-1]]["bbox"][1] <= 3.0:
            baselines[-1].append(k)
        else:
            baselines.append([k])

    def top(bi):
        return min(line_cells[k]["bbox"][1] for k in baselines[bi])

    def sig(bi):
        """Clustered left edges of the baseline's fragments."""
        xs = sorted(line_cells[k]["bbox"][0] for k in baselines[bi])
        grp: list[float] = []
        for x in xs:
            if not grp or x - grp[-1] > 3.0:
                grp.append(x)
        return grp

    def same_sig(a, b):
        return len(a) == len(b) and all(abs(x - y) <= 3.0
                                        for x, y in zip(a, b))

    sigs = [sig(bi) for bi in range(len(baselines))]
    out: list[dict] = []
    consumed: set[int] = set()
    used_baselines: set[int] = set()
    bi = 0
    while bi < len(baselines):
        if bi in used_baselines or len(sigs[bi]) < 3:
            bi += 1
            continue
        # grow the identical-signature core
        core = [bi]
        j = bi + 1
        while j < len(baselines) and same_sig(sigs[bi], sigs[j]) \
                and top(j) - top(core[-1]) <= 30.0:
            core.append(j)
            j += 1
        if len(core) < 3:
            bi += 1
            continue
        rails = sigs[bi]
        x_lo = rails[0] - 2.0
        x_hi = max(line_cells[k]["bbox"][2]
                   for ci in core for k in baselines[ci]) + 2.0

        def in_extent(k):
            b = line_cells[k]["bbox"]
            return b[2] > x_lo and b[0] < x_hi

        def joins_as_row(cand):
            ins = [k for k in baselines[cand] if in_extent(k)]
            if len(ins) < 2:
                return False
            return all(
                any(abs(line_cells[k]["bbox"][0] - rx) <= 3.0
                    for rx in rails)
                for k in ins
            )

        rows = list(core)
        med_pitch = sorted(
            top(rows[j + 1]) - top(rows[j]) for j in range(len(rows) - 1)
        )[(len(rows) - 2) // 2] or 18.0
        # extend down then up with rail-conforming neighbors; baselines
        # whose fragments ALL lie outside the extent (the other half of
        # a 2-up page) are transparent — skipped, never consumed, and
        # the row-pitch gap is measured against the last ACCEPTED row
        j = core[-1] + 1
        while j < len(baselines) and j not in used_baselines:
            if not any(in_extent(k) for k in baselines[j]):
                j += 1
                continue
            if top(j) - top(rows[-1]) <= 1.8 * med_pitch \
                    and joins_as_row(j):
                rows.append(j)
                j += 1
            else:
                break
        j = core[0] - 1
        while j >= 0 and j not in used_baselines:
            if not any(in_extent(k) for k in baselines[j]):
                j -= 1
                continue
            if top(rows[0]) - top(j) <= 1.8 * med_pitch \
                    and joins_as_row(j):
                rows.insert(0, j)
                j -= 1
            else:
                break
        # header rows: up to 2 baselines above, fragments inside extent.
        # Guarded against swallowing non-header text: a table caption or
        # the last line of the paragraph above also sits directly over
        # the grid — real header cells are NARROW column labels, so a
        # baseline whose in-extent fragments span >60% of the extent, or
        # that reads like a caption, ends the walk instead of joining.
        headers: list[int] = []
        cap_re = re.compile(
            r"^\s*(table|figure|fig\.|tab\.|표|그림)\s*\d", re.I)
        j = rows[0] - 1
        while j >= 0 and len(headers) < 2 and j not in used_baselines:
            ins = [k for k in baselines[j] if in_extent(k)]
            if not ins:
                j -= 1
                continue
            below = headers[-1] if headers else rows[0]
            span = sum(min(line_cells[k]["bbox"][2], x_hi)
                       - max(line_cells[k]["bbox"][0], x_lo) for k in ins)
            looks_caption = any(
                cap_re.match(line_cells[k]["text"]) for k in ins)
            if top(below) - top(j) <= 1.8 * med_pitch \
                    and span <= 0.6 * (x_hi - x_lo) and not looks_caption:
                headers.append(j)
                j -= 1
            else:
                break
        joined = "".join(line_cells[k]["text"]
                         for ci in headers + rows for k in baselines[ci])
        if _rtl_dominant(joined):
            bi = core[-1] + 1
            continue
        bounds = [x_lo] + [rails[j2] - 2.0
                           for j2 in range(1, len(rails))] + [x_hi]
        page_no = line_cells[baselines[rows[0]][0]]["page_no"]

        def emit_row(members: list[int]) -> None:
            ins = [k for k in members if in_extent(k)]
            if not ins:
                return
            row_top = min(line_cells[k]["bbox"][1] for k in ins)
            row_bot = max(line_cells[k]["bbox"][3] for k in ins)
            by_col: dict[int, list[int]] = {}
            for k in ins:
                b = line_cells[k]["bbox"]
                overlaps = [
                    min(b[2], bounds[j2 + 1]) - max(b[0], bounds[j2])
                    for j2 in range(len(rails))
                ]
                col = max(range(len(rails)), key=lambda j2: overlaps[j2])
                by_col.setdefault(col, []).append(k)
                consumed.add(k)
            for col, ks in sorted(by_col.items()):
                ks.sort(key=lambda k: (line_cells[k]["bbox"][1],
                                       line_cells[k]["bbox"][0]))
                text = _WSRUN_RE.sub(
                    " ",
                    " ".join(line_cells[k]["text"].strip()
                             for k in ks)).strip()
                out.append({
                    "page_no": page_no,
                    "bbox": (bounds[col], row_top,
                             bounds[col + 1], row_bot),
                    "text": text,
                    "conf": 1.0,
                    "label": "table_cell",
                })

        if headers:
            emit_row([k for ci in sorted(headers) for k in baselines[ci]])
        for ci in rows:
            emit_row(list(baselines[ci]))
        used_baselines.update(headers)
        used_baselines.update(rows)
        bi = rows[-1] + 1
    return out, consumed


def _coalesce_segments(segs: list, axis: int, line_tol: float = 2.0,
                       gap_tol: float = 5.0) -> list:
    """Merge collinear rule segments into maximal spans.

    ``axis=0``: horizontal segments — grouped by y center, merged along
    x. ``axis=1``: vertical — grouped by x center, merged along y.
    Returns (x0, y0, x1, y1) tuples like the input.
    """
    if not segs:
        return segs
    if axis == 0:
        keyed = sorted(((sg[1] + sg[3]) / 2.0, min(sg[0], sg[2]),
                        max(sg[0], sg[2])) for sg in segs)
    else:
        keyed = sorted(((sg[0] + sg[2]) / 2.0, min(sg[1], sg[3]),
                        max(sg[1], sg[3])) for sg in segs)
    out = []
    group: list[tuple[float, float, float]] = []

    def flush():
        if not group:
            return
        k = sum(g[0] for g in group) / len(group)
        spans = sorted((g[1], g[2]) for g in group)
        lo, hi = spans[0]
        merged = []
        for s, e in spans[1:]:
            if s - hi <= gap_tol:
                hi = max(hi, e)
            else:
                merged.append((lo, hi))
                lo, hi = s, e
        merged.append((lo, hi))
        for lo, hi in merged:
            out.append((lo, k, hi, k) if axis == 0 else (k, lo, k, hi))

    for item in keyed:
        if group and item[0] - group[-1][0] > line_tol:
            flush()
            group = []
        group.append(item)
    flush()
    return out


def detect_ruled_tables(
    rules: list[tuple], runs: list["_Run"], page_h: float
) -> tuple[list[dict], set[int]]:
    """Painted axis-aligned segments → table grids → table_cell cells.

    The deterministic core of what the reference's TableFormer model
    recovers for *ruled* tables: horizontal rule ys and vertical rule xs
    cluster into row/column boundaries; text runs whose baseline center
    falls inside a grid cell become that cell's content. Returns
    (table_cell dicts in row-major order, consumed run indices).
    Conservative: needs ≥3 distinct horizontal rules, ≥2 vertical rules
    (the grid's outer edges contribute two virtual column boundaries, so
    2 drawn verticals already form ≥3 column edges — booktabs layouts),
    mutual extent overlap, and ≥4 non-empty cells — underlines, boxed
    figures and single rules never qualify. Borderless tables remain the
    ML model's territory (documented out of scope)."""
    hs = [sg for sg in rules if abs(sg[3] - sg[1]) < 0.7]
    vs = [sg for sg in rules if abs(sg[2] - sg[0]) < 0.7]
    if len(hs) < 3 or len(vs) < 2:
        return [], set()
    # COALESCE collinear segments first: many generators stroke each
    # cell's border separately, so a single visual rule arrives as a row
    # of short segments — none of which would pass the 60%-of-extent
    # full-width check below (r3 left such grids unreconstructed and
    # their text inline). Segments on one line (±2 pt) whose gaps are
    # ≤ 5 pt merge into one span; idempotent, so the band-split
    # recursion re-coalescing is harmless.
    hs = _coalesce_segments(hs, axis=0)
    vs = _coalesce_segments(vs, axis=1)
    # BAND-SPLIT first: all painted rules on a page are NOT one grid — a
    # footnote separator or a second stacked table hundreds of points
    # away would otherwise extend the lattice and swallow the body text
    # between them into phantom cells. Horizontal rules whose vertical
    # gaps stay within a band (≤ max(72pt, 4x the band's median gap))
    # form one candidate grid; each band is evaluated independently.
    ys_desc = sorted({round((sg[1] + sg[3]) / 2.0, 1) for sg in hs},
                     reverse=True)
    gaps = [ys_desc[k] - ys_desc[k + 1] for k in range(len(ys_desc) - 1)]
    pos = sorted(g for g in gaps if g > 2.0)
    med = pos[len(pos) // 2] if pos else 0.0
    split_at = max(72.0, 4.0 * med)
    bands: list[tuple[float, float]] = []
    start = 0
    for k, g in enumerate(gaps):
        if g > split_at:
            bands.append((ys_desc[start], ys_desc[k]))
            start = k + 1
    bands.append((ys_desc[start], ys_desc[-1]))
    if len(bands) > 1:
        all_cells: list[dict] = []
        all_consumed: set[int] = set()
        for top, bot in bands:
            band_hs = [sg for sg in hs
                       if bot - 1.0 <= (sg[1] + sg[3]) / 2.0 <= top + 1.0]
            band_vs = [sg for sg in vs
                       if min(sg[1], sg[3]) <= top + 2.0
                       and max(sg[1], sg[3]) >= bot - 2.0]
            c, used = detect_ruled_tables(band_hs + band_vs, runs, page_h)
            all_cells.extend(c)
            all_consumed |= used
        return all_cells, all_consumed
    # MUTUAL-EXTENT clip (r4): the grid lives where horizontal and
    # vertical rules overlap. A page mixes the table's rules with title
    # underlines and other-column separators; those widen the h extent
    # so no rule passes the full-width check below. When the clip keeps
    # a viable grid (≥3 h-rules inside the v-rules' y-span), evaluate
    # THAT; otherwise fall through with everything (booktabs grids with
    # only short verticals must keep working).
    vy_lo = min(min(sg[1], sg[3]) for sg in vs) - 2.0
    vy_hi = max(max(sg[1], sg[3]) for sg in vs) + 2.0
    hs_grid = [sg for sg in hs if vy_lo <= (sg[1] + sg[3]) / 2.0 <= vy_hi]
    if len(hs_grid) >= 3:
        # re-admit rules within ONE median row pitch ABOVE the span:
        # grids whose verticals start below the header row would
        # otherwise lose their top border (and with it the header row).
        # Only the top side widens — below the bottom border sits body
        # text and footnote separators, and re-admitting one would
        # swallow that text into a phantom table row (device y-up: the
        # top border is the vy_hi side)
        g_ys = sorted({round((sg[1] + sg[3]) / 2.0, 1) for sg in hs_grid})
        g_gaps = sorted(b - a for a, b in zip(g_ys, g_ys[1:]) if b - a > 2.0)
        pitch = g_gaps[len(g_gaps) // 2] if g_gaps else 0.0
        lo2, hi2 = vy_lo, vy_hi + pitch + 2.0
        hs = [sg for sg in hs if lo2 <= (sg[1] + sg[3]) / 2.0 <= hi2]
    # grid extent: the span the rules actually cover
    x_lo = min(min(sg[0], sg[2]) for sg in hs) - 2.0
    x_hi = max(max(sg[0], sg[2]) for sg in hs) + 2.0
    # row boundaries: only rules spanning most of the grid width count —
    # partial-width rules (LaTeX \cmidrule group underlines) would split
    # a multi-line header into phantom rows
    full = [sg for sg in hs
            if abs(sg[2] - sg[0]) >= 0.6 * max(x_hi - x_lo - 4.0, 1.0)]
    if len(full) < 3:
        return [], set()
    row_ys = _cluster([(sg[1] + sg[3]) / 2.0 for sg in full], 2.0)
    col_xs = _cluster([(sg[0] + sg[2]) / 2.0 for sg in vs], 2.0)
    if len(row_ys) < 3 or len(col_xs) < 2:
        return [], set()
    y_lo = min(row_ys) - 1.0
    y_hi = max(row_ys) + 1.0
    col_xs = [x for x in col_xs if x_lo - 4 <= x <= x_hi + 4]
    # booktabs-style tables have no outer vertical rules: the grid edge
    # supplies virtual first/last column boundaries
    col_xs = sorted(col_xs)
    if not col_xs or col_xs[0] - x_lo > 6.0:
        col_xs = [x_lo] + col_xs
    if x_hi - col_xs[-1] > 6.0:
        col_xs = col_xs + [x_hi]
    if len(col_xs) < 3:
        return [], set()
    row_ys = sorted(row_ys, reverse=True)  # device y-up: top row first
    cells: dict[tuple[int, int], list] = {}
    consumed: set[int] = set()
    for ri, r in enumerate(runs):
        cy = r.y + 0.4 * r.size
        cx = r.x + r.w / 2.0
        if not (y_lo <= cy <= y_hi and x_lo <= cx <= x_hi):
            continue
        row = col = None
        for k in range(len(row_ys) - 1):
            if row_ys[k] >= cy >= row_ys[k + 1]:
                row = k
                break
        for k in range(len(col_xs) - 1):
            if col_xs[k] <= cx <= col_xs[k + 1]:
                col = k
                break
        # inside the grid box but off the boundary lattice → clamp (runs
        # at the very edge; leaving them out interleaves text cells into
        # the table band and fragments the assembled table)
        if row is None:
            row = 0 if cy > row_ys[0] else len(row_ys) - 2
        if col is None:
            col = 0 if cx < col_xs[0] else len(col_xs) - 2
        cells.setdefault((row, col), []).append(ri)
        consumed.add(ri)
    non_empty = sum(1 for v in cells.values() if v)
    used_cols = {c for _, c in cells}
    used_rows = {r for r, _ in cells}
    if non_empty < 4 or len(used_cols) < 2 or len(used_rows) < 2:
        return [], set()
    # RTL-dominant content: cell joining and row-major emission assume
    # left-to-right order — bail and let the bidi-aware line path handle
    # the region (keeps logical order; ruled RTL tables degrade to lines)
    joined = "".join(runs[k].text for v in cells.values() for k in v)
    if _rtl_dominant(joined):
        return [], set()
    out: list[dict] = []
    for (row, col) in sorted(cells):
        rr = sorted(cells[(row, col)],
                    key=lambda k: (-runs[k].y, runs[k].x))
        text = " ".join(runs[k].text.strip() for k in rr).strip()
        text = _WSRUN_RE.sub(" ", text)
        top_y = row_ys[row]
        bot_y = row_ys[row + 1]
        out.append(
            {
                "page_no": runs[rr[0]].page_no,
                "bbox": (col_xs[col], page_h - top_y,
                         col_xs[col + 1], page_h - bot_y),
                "text": text,
                "conf": 1.0,
                "label": "table_cell",
            }
        )
    return out, consumed
