"""OLE2 / Compound File Binary reader (pure stdlib, [MS-CFB] spec).

The container under every legacy binary Office format (.doc/.xls/.ppt).
The reference never parses it — it shells out to LibreOffice to
up-convert (docling/backend/docx/drawingml/utils.py:79-120) and raises
when soffice is absent; this from-scratch reader lets the legacy engines
(docbinx/xlsbinx/pptbinx) extract natively instead.

Supports: 512/4096-byte sectors, DIFAT chains, FAT chains, the mini
stream + miniFAT for streams under the cutoff, and the directory tree.
Defensive throughout: malformed structures raise OleError (typed) so
extraction containment maps them to failure rows.
"""

from __future__ import annotations

import struct

__all__ = ["OleError", "OleFile"]

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE


class OleError(ValueError):
    pass


class OleFile:
    def __init__(self, data: bytes):
        if len(data) < 512 or data[:8] != _MAGIC:
            raise OleError("not an OLE2 compound file")
        self.data = data
        (sector_shift, mini_shift) = struct.unpack_from("<HH", data, 30)
        self.sec = 1 << sector_shift
        self.mini_sec = 1 << mini_shift
        if self.sec not in (512, 4096):
            raise OleError(f"bad sector size {self.sec}")
        (self.n_fat,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.n_difat,) = struct.unpack_from("<I", data, 72)
        self.fat = self._load_fat()
        self.dirs = self._load_dirs()
        self.minifat = self._load_minifat()
        root = self.dirs[0] if self.dirs else None
        self.mini_stream = (
            self._read_chain(root["start"], root["size"])
            if root is not None else b""
        )

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.sec
        return self.data[off:off + self.sec]

    def _load_fat(self) -> list[int]:
        # DIFAT: first 109 entries in the header, then chained sectors
        difat = list(struct.unpack_from("<109I", self.data, 76))
        nxt = self.difat_start
        hops = 0
        while nxt not in (_FREE, _ENDCHAIN) and hops < 10000:
            s = self._sector(nxt)
            if len(s) < self.sec:
                break
            vals = struct.unpack(f"<{self.sec // 4}I", s)
            difat.extend(vals[:-1])
            nxt = vals[-1]
            hops += 1
        fat: list[int] = []
        per = self.sec // 4
        for fs in difat:
            if fs in (_FREE, _ENDCHAIN):
                continue
            s = self._sector(fs)
            if len(s) == self.sec:
                fat.extend(struct.unpack(f"<{per}I", s))
        return fat

    def _read_chain(self, start: int, size: int | None = None) -> bytes:
        out = bytearray()
        n = start
        hops = 0
        limit = len(self.fat)
        while n not in (_FREE, _ENDCHAIN) and hops < limit + 2:
            out += self._sector(n)
            if n >= limit:
                break
            n = self.fat[n]
            hops += 1
        return bytes(out[:size]) if size is not None else bytes(out)

    def _load_minifat(self) -> list[int]:
        raw = self._read_chain(self.minifat_start) \
            if self.minifat_start not in (_FREE, _ENDCHAIN) else b""
        return list(struct.unpack(f"<{len(raw) // 4}I", raw[:len(raw) // 4 * 4]))

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        n = start
        hops = 0
        while n not in (_FREE, _ENDCHAIN) and hops < len(self.minifat) + 2:
            off = n * self.mini_sec
            out += self.mini_stream[off:off + self.mini_sec]
            if n >= len(self.minifat):
                break
            n = self.minifat[n]
            hops += 1
        return bytes(out[:size])

    def _load_dirs(self) -> list[dict]:
        raw = self._read_chain(self.dir_start)
        out = []
        for k in range(len(raw) // 128):
            e = raw[k * 128:(k + 1) * 128]
            (name_len,) = struct.unpack_from("<H", e, 64)
            name = e[:max(0, min(name_len - 2, 64))].decode(
                "utf-16-le", "replace")
            etype = e[66]
            (start,) = struct.unpack_from("<I", e, 116)
            (size,) = struct.unpack_from("<Q", e, 120)
            if self.sec == 512:
                size &= 0xFFFFFFFF  # v3 files: only the low 32 bits count
            if etype in (1, 2, 5):  # storage, stream, root
                out.append({"name": name, "type": etype,
                            "start": start, "size": size})
        return out

    def streams(self) -> list[str]:
        return [d["name"] for d in self.dirs if d["type"] == 2]

    def read(self, name: str) -> bytes:
        for d in self.dirs:
            if d["name"] == name and d["type"] == 2:
                if d["size"] < self.mini_cutoff:
                    return self._read_mini_chain(d["start"], d["size"])
                return self._read_chain(d["start"], d["size"])
        raise OleError(f"stream not found: {name!r}")
