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

__all__ = ["OleError", "OleFile", "write_ole2"]

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
        # hard cap every structure by the file's ACTUAL sector count:
        # header counts and DIFAT contents are attacker-controlled, and
        # unbounded trust turned a crafted ~KB file into GBs of FAT /
        # directory data (verified memory-bomb class)
        self.max_sectors = max(0, (len(data) - 512 + self.sec - 1)
                               // self.sec)
        self.fat = self._load_fat()
        self.dirs = self._load_dirs()
        self.minifat = self._load_minifat()
        root = next((d for d in self.dirs if d["type"] == 5), None)
        self.mini_stream = (
            self._read_chain(root["start"], root["size"])
            if root is not None else b""
        )

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.sec
        return self.data[off:off + self.sec]

    def _load_fat(self) -> list[int]:
        # DIFAT: first 109 entries in the header, then chained sectors.
        # visited-set + sector-count caps: a self-referencing DIFAT
        # chain or repeated DIFAT entries amplified a small file into an
        # arbitrarily large FAT (109x verified at 5.6KB; unbounded at
        # larger inputs)
        difat = list(struct.unpack_from("<109I", self.data, 76))
        nxt = self.difat_start
        seen_difat: set[int] = set()
        while nxt not in (_FREE, _ENDCHAIN):
            if nxt in seen_difat or len(seen_difat) > self.max_sectors:
                raise OleError("DIFAT chain cycle")
            seen_difat.add(nxt)
            s = self._sector(nxt)
            if len(s) < self.sec:
                break
            vals = struct.unpack(f"<{self.sec // 4}I", s)
            difat.extend(vals[:-1])
            nxt = vals[-1]
        fat: list[int] = []
        per = self.sec // 4
        seen_fs: set[int] = set()
        for fs in difat:
            if fs in (_FREE, _ENDCHAIN) or fs in seen_fs:
                continue
            seen_fs.add(fs)
            if len(fat) >= self.max_sectors + per:
                break  # entries past EOF can never address real sectors
            s = self._sector(fs)
            if len(s) == self.sec:
                fat.extend(struct.unpack(f"<{per}I", s))
        return fat

    def _read_chain(self, start: int, size: int | None = None) -> bytes:
        out = bytearray()
        n = start
        seen: set[int] = set()
        limit = len(self.fat)
        while n not in (_FREE, _ENDCHAIN):
            if n in seen:
                raise OleError("FAT chain cycle")
            if len(seen) > self.max_sectors:
                raise OleError("FAT chain longer than the file")
            seen.add(n)
            out += self._sector(n)
            if n >= limit:
                break
            n = self.fat[n]
        return bytes(out[:size]) if size is not None else bytes(out)

    def _load_minifat(self) -> list[int]:
        raw = self._read_chain(self.minifat_start) \
            if self.minifat_start not in (_FREE, _ENDCHAIN) else b""
        return list(struct.unpack(f"<{len(raw) // 4}I", raw[:len(raw) // 4 * 4]))

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        n = start
        seen: set[int] = set()
        while n not in (_FREE, _ENDCHAIN):
            if n in seen:
                raise OleError("miniFAT chain cycle")
            seen.add(n)
            off = n * self.mini_sec
            out += self.mini_stream[off:off + self.mini_sec]
            if n >= len(self.minifat):
                break
            n = self.minifat[n]
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
            left, right, child = struct.unpack_from("<lll", e, 68)
            (start,) = struct.unpack_from("<I", e, 116)
            (size,) = struct.unpack_from("<Q", e, 120)
            if self.sec == 512:
                size &= 0xFFFFFFFF  # v3 files: only the low 32 bits count
            if etype in (1, 2, 5):  # storage, stream, root
                out.append({"name": name, "type": etype, "idx": k,
                            "left": left, "right": right, "child": child,
                            "start": start, "size": size})
        return out

    def _root_level(self) -> list[dict]:
        """Directory entries that are DIRECT children of the root
        storage (red-black sibling tree walk from root.child). A flat
        scan matched streams by bare name across every nested storage —
        an embedded OLE object's 'WordDocument' could shadow or misroute
        the real root stream. Falls back to the flat list when the tree
        is unwalkable (corrupt sibling ids)."""
        by_idx = {d["idx"]: d for d in self.dirs}
        root = next((d for d in self.dirs if d["type"] == 5), None)
        if root is None:
            return self.dirs
        out: list[dict] = []
        seen: set[int] = set()
        todo = [root["child"]]
        while todo:
            i = todo.pop()
            if i < 0 or i in seen or i not in by_idx:
                continue
            seen.add(i)
            if len(seen) > len(self.dirs):
                break
            d = by_idx[i]
            out.append(d)
            todo.extend([d["left"], d["right"]])
        return out if out else self.dirs

    def streams(self) -> list[str]:
        return [d["name"] for d in self._root_level() if d["type"] == 2]

    def read(self, name: str) -> bytes:
        # root-level streams first; nested storages only as a fallback
        # (some producers bury a real stream one level down)
        for scope in (self._root_level(), self.dirs):
            for d in scope:
                if d["name"] == name and d["type"] == 2:
                    if d["size"] < self.mini_cutoff:
                        return self._read_mini_chain(d["start"], d["size"])
                    return self._read_chain(d["start"], d["size"])
        raise OleError(f"stream not found: {name!r}")


def write_ole2(streams: list[tuple[str, bytes]]) -> bytes:
    """Minimal OLE2 v3 writer — the shared container for the legacy
    synthesizers (docbinx/xlsbinx/pptbinx). Every stream is padded to
    the mini cutoff so it stays FAT-resident; the FAT grows to as many
    sectors as the payload needs (header-DIFAT only: ≤109 FAT sectors ≈
    6.9 GB, far beyond any synthesized fixture)."""
    padded = []
    for _name, data in streams:
        d = data + b"\x00" * max(0, 4096 - len(data))
        d += b"\x00" * ((-len(d)) % 512)
        padded.append(d)
    n_data = sum(len(d) // 512 for d in padded)
    n_dir = max(1, (len(streams) + 1 + 3) // 4)  # 4 dirents per sector
    per_fat = 512 // 4
    n_fat = 1
    while n_fat * per_fat < n_fat + n_dir + n_data:
        n_fat += 1
    if n_fat > 109:
        raise OleError("stream set too large for a header-DIFAT file")
    dir_start = n_fat
    fat = [0xFFFFFFFF] * (per_fat * n_fat)
    for k in range(n_fat):
        fat[k] = 0xFFFFFFFD
    for k in range(n_dir):
        fat[dir_start + k] = dir_start + k + 1 if k < n_dir - 1 \
            else 0xFFFFFFFE
    starts = []
    nxt = dir_start + n_dir
    for d in padded:
        starts.append(nxt)
        n = len(d) // 512
        for k in range(n):
            fat[nxt + k] = nxt + k + 1 if k < n - 1 else 0xFFFFFFFE
        nxt += n

    def dirent(name: str, etype: int, start: int, size: int,
               child: int = -1, right: int = -1) -> bytes:
        e = bytearray(128)
        enc = name.encode("utf-16-le")
        if len(enc) + 2 > 64:
            # spec max: 31 UTF-16 chars + terminator in the 64-byte
            # field; overflowing silently clobbered the metadata bytes
            # and made the just-written stream unreadable
            raise OleError(f"stream name too long: {name!r}")
        e[:len(enc)] = enc
        struct.pack_into("<H", e, 64, len(enc) + 2)
        e[66] = etype
        e[67] = 1
        struct.pack_into("<lll", e, 68, -1, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    directory = dirent("Root Entry", 5, _ENDCHAIN, 0,
                       child=1 if streams else -1)
    for i, ((name, data), st, d) in enumerate(zip(streams, starts,
                                                  padded)):
        right = i + 2 if i + 1 < len(streams) else -1
        # record the TRUE length when it's >= the mini cutoff (padded
        # sizes appended up to 511 NUL bytes to read-backs); smaller
        # streams MUST record the padded length — the cutoff routes
        # sub-4096 sizes to the mini stream, which this writer does not
        # emit (padding-to-cutoff is what keeps them FAT-resident), so a
        # true sub-cutoff size would read back empty
        size = len(data) if len(data) >= 4096 else len(d)
        directory += dirent(name, 2, st, size, right=right)
    directory += b"\x00" * ((512 * n_dir) - len(directory))

    hdr = bytearray(512)
    hdr[:8] = _MAGIC
    struct.pack_into("<H", hdr, 24, 0x003E)
    struct.pack_into("<H", hdr, 26, 0x0003)
    struct.pack_into("<H", hdr, 28, 0xFFFE)
    struct.pack_into("<H", hdr, 30, 9)
    struct.pack_into("<H", hdr, 32, 6)
    struct.pack_into("<I", hdr, 44, n_fat)
    struct.pack_into("<I", hdr, 48, dir_start)
    struct.pack_into("<I", hdr, 56, 4096)
    struct.pack_into("<I", hdr, 60, _ENDCHAIN)
    struct.pack_into("<I", hdr, 68, _ENDCHAIN)
    difat = list(range(n_fat)) + [0xFFFFFFFF] * (109 - n_fat)
    struct.pack_into("<109I", hdr, 76, *difat)
    fat_bytes = struct.pack(f"<{len(fat)}I", *fat)
    return bytes(hdr) + fat_bytes + directory + b"".join(padded)
